from nomalise_kmers_multi_large_tpu.io.reader import (  # noqa: F401
    FastxFile,
    RecordBatch,
    batch_iterator,
    paired_batch_iterator,
)
from nomalise_kmers_multi_large_tpu.io.writer import ShardWriter  # noqa: F401
