"""K-mer spectrum analytics on direct and hashed tables."""
import numpy as np
import jax.numpy as jnp

from nomalise_kmers_multi_large_tpu.models.spectrum import spectrum
from nomalise_kmers_multi_large_tpu.ops.streamrank import sorted_occurrence_stream
from nomalise_kmers_multi_large_tpu.table import DirectTable, HashedTable


def _stream(codes):
    codes = np.asarray(codes, np.uint64)
    hi = (codes >> 32).astype(np.uint32)
    lo = (codes & 0xFFFFFFFF).astype(np.uint32)
    return sorted_occurrence_stream(
        jnp.asarray(hi), jnp.asarray(lo), jnp.ones(len(codes), bool)
    )


def test_spectrum_direct():
    t = DirectTable(7)
    s = t.init()
    # 3 kmers seen 1x, 2 seen 5x, 1 seen 10x
    codes = [1, 2, 3] + [4] * 5 + [5] * 5 + [6] * 10
    s, _ = t.count_and_update(s, _stream(codes))
    sp = spectrum(t, s)
    assert sp.distinct_kmers == 6
    assert sp.total_kmers == len(codes)
    assert sp.histogram[1] == 3 and sp.histogram[5] == 2 and sp.histogram[10] == 1
    assert sp.coverage_peak == 5  # peak past the multiplicity-1 error band


def test_spectrum_hashed_with_seeds():
    t = HashedTable(7, 1 << 10)
    s = t.init()
    s, _ = t.count_and_update(s, _stream([7, 8, 9]), seed=True)
    s, _ = t.count_and_update(s, _stream([7, 7, 7]))
    sp = spectrum(t, s)
    assert sp.histogram[0] == 2  # seeded, never seen
    assert sp.histogram[3] == 1
    assert sp.distinct_kmers == 1  # counted kmers only
    assert sp.total_kmers == 3


def test_spectrum_bucket():
    """Bucket-table states (keys = [rows, 128] fingerprints) must work too —
    auto picks the bucket table on accelerators, and --spectrum reads the
    final shard state (regression: 2-D counts crashed jnp.bincount)."""
    from nomalise_kmers_multi_large_tpu.table import BucketTable

    t = BucketTable(7, rows=128)
    s = t.init()
    codes = np.array([1, 2, 3] + [4] * 5 + [5] * 5 + [6] * 10, np.uint32)
    s, _ = t.process_batch_mixed(
        s, jnp.asarray(codes)[None, :], jnp.ones((1, len(codes)), bool),
        depth=100, windows_per_read=len(codes))
    sp = spectrum(t, s)
    assert sp.distinct_kmers == 6
    assert sp.total_kmers == len(codes)
    assert sp.histogram[1] == 3 and sp.histogram[5] == 2 and sp.histogram[10] == 1
    assert sp.coverage_peak == 5


def test_spectrum_wide_bucket():
    from nomalise_kmers_multi_large_tpu.ops.mix import feistel_words_np
    from nomalise_kmers_multi_large_tpu.table import BucketTableWide

    k = 21
    t = BucketTableWide(k, rows=512)
    s = t.init()
    codes = np.array([11, 12, 13] + [14] * 5 + [15] * 5 + [16] * 10,
                     np.uint64)
    w1, w2 = feistel_words_np(codes, 2 * k)
    s, _ = t.process_batch_keys(
        s, jnp.asarray(w1[None, :]), jnp.asarray(w2[None, :]),
        jnp.ones((1, len(codes)), bool), depth=3,
        windows_per_read=len(codes))
    sp = spectrum(t, s)
    assert sp.distinct_kmers == 6
    assert sp.total_kmers == len(codes)
    assert sp.histogram[1] == 3 and sp.histogram[5] == 2 and sp.histogram[10] == 1
