"""Sources: typed CSV reads (reference S1 parity), pruned parquet,
binlog-segment tailing."""
