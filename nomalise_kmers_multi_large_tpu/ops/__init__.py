from nomalise_kmers_multi_large_tpu.ops.codec import (  # noqa: F401
    encode_windows,
    encode_windows_canonical,
    window_validity,
    decode_codes,
)
from nomalise_kmers_multi_large_tpu.ops.streamrank import sorted_occurrence_stream  # noqa: F401
