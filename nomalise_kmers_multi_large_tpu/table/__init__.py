from nomalise_kmers_multi_large_tpu.table.direct import DirectTable  # noqa: F401
from nomalise_kmers_multi_large_tpu.table.hashed import HashedTable  # noqa: F401
from nomalise_kmers_multi_large_tpu.table.base import CountTable, TableState  # noqa: F401


def make_table(cfg) -> "CountTable":
    """Pick the table implementation for a config (direct for k<=15 unless told
    otherwise; mirrors the reference's 'size the table to 4^k and collisions vanish'
    advice, normalise_kmers_multi_large.c:20-22)."""
    if cfg.table_kind == "direct":
        return DirectTable(k=cfg.ksize)
    return HashedTable(k=cfg.ksize, initial_capacity=cfg.initial_hash_capacity)
