"""Workload-shaped DataContext tuning (ROADMAP #8).

One place to encode what BENCH/BASELINE.md measured about this engine's
payload shapes, instead of scattering magic numbers per pipeline:

  * ``cdc_text``   — string-heavy CDC events (the default workload):
      sort-based shuffle (measured 3-4× faster than hash_shuffle for
      this payload at 8 and 32 cpus), default block size.
  * ``wide_binary``— multimodal payload blocks (images/audio bytes):
      small target blocks so a batch × concurrency of encoded payloads
      fits worker heaps; callers should also pass small ``batch_size``
      to actor stages (stages/multimodal.py does).
  * ``narrow_numeric`` — embeddings / metrics: larger blocks amortize
      per-block scheduling for tiny rows.

Apply returns the context so callers can chain; values are explicit so
a cluster operator can read THIS file instead of diffing contexts.
"""

from __future__ import annotations

from ray.data import DataContext

MiB = 1024 * 1024

PROFILES: dict[str, dict] = {
    "cdc_text": {
        "target_max_block_size": 128 * MiB,
        "shuffle_strategy": "sort_shuffle_pull_based",
    },
    "wide_binary": {
        "target_max_block_size": 32 * MiB,
        "shuffle_strategy": "sort_shuffle_pull_based",
    },
    "narrow_numeric": {
        "target_max_block_size": 256 * MiB,
        "shuffle_strategy": "sort_shuffle_pull_based",
    },
}


def apply(profile: str, ctx: DataContext | None = None) -> DataContext:
    """Apply a named workload profile to the (current) DataContext."""
    if profile not in PROFILES:
        raise ValueError(
            f"unknown profile {profile!r}; one of {sorted(PROFILES)}"
        )
    ctx = ctx or DataContext.get_current()
    p = PROFILES[profile]
    ctx.target_max_block_size = p["target_max_block_size"]
    from ray.data.context import ShuffleStrategy

    ctx.shuffle_strategy = {
        "sort_shuffle_pull_based": ShuffleStrategy.SORT_SHUFFLE_PULL_BASED,
        "hash_shuffle": ShuffleStrategy.HASH_SHUFFLE,
    }[p["shuffle_strategy"]]
    ctx.enable_progress_bars = False
    return ctx
