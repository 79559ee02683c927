"""TPU-native digital normalization (diginorm) engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference C tool
``alpapan/nomalise_kmers_multi_large`` (``normalise_kmers_multi_large.c``): streaming
digital normalization of paired-end / single-end Illumina FASTQ/FASTA reads.

Architecture (TPU-first, not a port):

- ``io``       host-side mmap FASTQ/FASTA reader, record framing, 2-bit packing,
               per-shard output writers (reference layers L1/L6).
- ``ops``      device compute: vectorized rolling k-mer encode, canonicalization,
               sort-based exact occurrence ranks, classification (reference L3/L4).
- ``table``    device-resident count tables: direct-address (collision-free, exact
               reference semantics) and hashed open-addressing with growth
               (reference L5, ``store_kmer``/``expand_local_hash_table``).
- ``models``   the normalization decision models (keep/skip policies; the reference's
               per-mate AND rule plus its commented-out pair-average variant).
- ``engine``   the streaming pipeline: batched host->HBM feed, jitted batch step,
               keep-mask driven output, progress/final reporting, checkpoint/resume.
- ``parallel`` device meshes and the two multi-chip strategies: Mode A (shard-local
               tables, data-parallel batches; generalizes the reference's independent
               per-thread tables) and Mode B (globally sharded exact table).
- ``cli``      argparse mirror of the reference's 16 flags.

Version constant mirrors the reference's ``VERSION`` (normalise_kmers_multi_large.c:1).
"""

VERSION = 20260817
REFERENCE_VERSION = 20240823

from nomalise_kmers_multi_large_tpu.config import Config  # noqa: E402,F401
