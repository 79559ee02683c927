from nomalise_kmers_multi_large_tpu.engine.step import BatchStep  # noqa: F401
