"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip logic is tested without TPU hardware per SURVEY.md section 4: CPU
devices simulate the mesh; the driver separately dry-runs the multi-chip path.
"""
import os

# The environment's sitecustomize force-registers the axon TPU backend and sets
# JAX_PLATFORMS=axon; jax.config.update after import is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib
import subprocess

import pytest

REFERENCE_TEST_DATA = pathlib.Path("/root/reference/test")
GOLDEN = pathlib.Path(__file__).parent / "golden"
REF_BINARY = pathlib.Path("/root/repo/.ref/bin/refnorm")

#: Tests that dominate the full suite's ~32 min (interpret-mode Pallas on
#: big fixtures, mesh runs, multi-process). `-m "not slow"` is the <5-min
#: quick gate for mid-round behavioral commits; the full suite (default)
#: remains the gate for anything touching decision semantics. Names from
#: the measured --durations table (everything >= ~10 s).
_SLOW = {
    "test_2seq_single_d2", "test_2seq_single_d100",
    "test_dispatch_group_multi_shard", "test_dispatch_group_parity",
    "test_multi_file_paired_fasta_out", "test_fasta_input_paired",
    "test_mixed_paired_and_single",
    "test_relaxed_decision_deltas_quantified_a1b1",
    "test_relaxed_flag_reaches_kernel",
    "test_relaxed_counts_exact_tallies_multiset_invariant",
    "test_debug2_upsert_lines_per_shard_paired",
    "test_debug2_upsert_lines_canonical_paired_byte_identical",
    "test_overflow_surfaces_in_report",
    "test_live_unique_kmers_refresh_in_retire",
    "test_debug3_roundtrip_bucket_path",
    "test_mode_b_bucket_wide_k21_matches_single_device",
    "test_mode_b_bucket_grows_mid_stream",
    "test_mode_b_bucket_relaxed_counts_exact",
    "test_mode_b_bucket_golden_a1_k13",
    "test_mode_b_bucket_checkpoint_resume",
    "test_bucket_growth_end_to_end_matches_direct",
    "test_hashed_growth_end_to_end_matches_direct",
    "test_seed_pass_grows", "test_mesh_mode_a_grows_mid_stream",
    "test_bucket_grown_remap_preserves_entries",
    "test_bucket_row_overflow_grows_and_replays",
    "test_bucket_row_overflow_replay_with_inflight_group",
    "test_mesh_checkpoint_resume", "test_mode_a_wide_table_k21",
    "test_mesh_feature_parity_dumps_debug_groups",
    "test_mode_b_multi_device_matches_single_device",
    "test_wide_table_checkpoint_roundtrip",
    "test_two_process_mode_a_aggregation",
    "test_wide_cli_pipeline_k21_matches_hashed",
    "test_wide_growth_preserves_contents",
    "test_bucket_matches_oracle", "test_bucket_pipeline_parity_2seq",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def ref_binary():
    """Compile the reference binary on demand (gitignored)."""
    if not REF_BINARY.exists():
        REF_BINARY.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["gcc", "-O2", "-o", str(REF_BINARY),
             "/root/reference/normalise_kmers_multi_large.c", "-lpthread"],
            check=True,
        )
    return REF_BINARY
