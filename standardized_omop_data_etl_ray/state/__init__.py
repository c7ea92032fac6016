"""Durable state: lake manifests, epoch markers, lineage."""
