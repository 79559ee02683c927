"""Regenerate golden captures by replaying each case's args.txt against the
compiled reference binary (normalise_kmers_multi_large.c, built with gcc -O2).

Each tests/golden/<case>/ dir records the exact reference argv in args.txt.
This script runs the reference in a scratch cwd and copies every output_* file
it produces into the golden dir, alongside the already-committed
stdout_stable.txt. Golden output files are re-included from .gitignore via the
`!tests/golden/**` negation so they survive fresh checkouts.

Usage: python tests/regen_golden.py
"""
from __future__ import annotations

import pathlib
import shlex
import shutil
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
REF_SRC = pathlib.Path("/root/reference/normalise_kmers_multi_large.c")
REF_BIN = REPO / ".ref" / "bin" / "refnorm"


def build_reference() -> pathlib.Path:
    if not REF_BIN.exists():
        REF_BIN.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["gcc", "-O2", "-o", str(REF_BIN), str(REF_SRC), "-lpthread"],
            check=True,
        )
    return REF_BIN


def ensure_fasta_fixtures() -> None:
    """The fasta_in_paired_k15 case references /root/repo/.ref/{a1,b1}.fasta
    (FASTA conversions committed under tests/data)."""
    dst = REPO / ".ref"
    dst.mkdir(parents=True, exist_ok=True)
    for name in ("a1.fasta", "b1.fasta"):
        src = REPO / "tests" / "data" / name
        if not (dst / name).exists():
            shutil.copy(src, dst / name)


def regen_case(case_dir: pathlib.Path, binary: pathlib.Path) -> list[str]:
    args = shlex.split((case_dir / "args.txt").read_text().strip())
    copied = []
    with tempfile.TemporaryDirectory() as td:
        proc = subprocess.run(
            [str(binary), *args], cwd=td, capture_output=True, text=True,
            timeout=7200,  # -m 17 cases memcpy a 17 GB table; this sandbox
            # first-touches pages at ~20 MB/s, so a case can take ~20 min
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"{case_dir.name}: reference exited {proc.returncode}\n{proc.stderr}"
            )
        for f in sorted(pathlib.Path(td).glob("output_*")):
            shutil.copy(f, case_dir / f.name)
            copied.append(f.name)
        # raw stdout/stderr only for the debug_* cases, which compare
        # DEBUG: line streams against stdout.txt (stdout_stable.txt stays
        # hand-curated); other cases don't use the raw captures (round-4
        # advisor finding: they were written everywhere and under-reported)
        if case_dir.name.startswith("debug_"):
            (case_dir / "stdout.txt").write_text(proc.stdout)
            copied.append("stdout.txt")
            (case_dir / "stderr.txt").write_text(proc.stderr)
            copied.append("stderr.txt")
    return copied


def main() -> int:
    binary = build_reference()
    ensure_fasta_fixtures()
    for case_dir in sorted(GOLDEN.iterdir()):
        if not (case_dir / "args.txt").exists():
            continue
        copied = regen_case(case_dir, binary)
        print(f"{case_dir.name}: {len(copied)} files -> {', '.join(copied)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
