"""Compression parameters and mode constants.

Mirrors PgRCParams (pgrc/pgrc-params.h:37-318) — the same knobs with the same
NORMAL-level defaults (q=120 permil, g=65%, seed 38+pg-size correction, M=3,
p=45) — for our PGTC archive.
"""
from __future__ import annotations

from dataclasses import dataclass, field

# archive modes (byte values in the PGTC header)
MODE_SE = 0
MODE_PE = 1
MODE_ORD_SE = 2
MODE_ORD_PE = 3
MODE_MIN_PE = 4

LEVEL_FAST = 1
LEVEL_NORMAL = 2
LEVEL_MAX = 3


@dataclass
class PgRCParams:
    src_fastq: str = ""
    pair_fastq: str = ""
    output: str = "out.pgtc"
    preserve_order: bool = False
    single_reads_mode: bool = False
    ignore_pair_order: bool = False
    compression_level: int = LEVEL_NORMAL

    # quality-based division (stage 1)
    error_limit_promils: int = 120
    simplified_suffix_mode: bool = True
    separate_n_reads: bool = True
    n_reads_lq: bool = False

    # generator division (stage 2)
    gen_quality_coef: float = 0.65

    # matching (stage 4)
    seed_k: int = 32                # k-mer seed length (readsExactMatchingChars role)
    min_chars_per_mismatch: int = 3  # maxMismatches = L // this
    match_cap: int = 8

    # pg-vs-pg final matching (stage 7)
    target_pg_match_length: int = 45

    # PE pair handling
    disable_revcomp_pair: bool = False

    # observability
    verbosity: int = 0              # 0 app, 1 +dev stream logs, 2 +trace
    report_path: str = ""           # append a TSV row per run (pgrc_res.txt role)

    # stage bisection (reference -B/-E, pgrc-params.h:299-317): run stages
    # begin_stage..end_stage of the 7-stage chain, loading/persisting
    # intermediate state in tmp_work_dir
    begin_stage: int = 1
    end_stage: int = 7
    tmp_work_dir: str = ""

    # chain state
    read_len: int = 0
    revcomp_pair_file: bool = False

    def mode(self) -> int:
        if self.single_reads_mode:
            return MODE_SE
        if self.preserve_order:
            return MODE_ORD_PE if self.pair_fastq else MODE_ORD_SE
        if self.pair_fastq:
            return MODE_MIN_PE if self.ignore_pair_order else MODE_PE
        return MODE_SE

    def resolve(self) -> None:
        """Derive chain flags (reference prepareChainData, pgrc-encoder.cpp:27-54:
        rev-compl pair file only in PE / ORD_PE modes)."""
        if not self.pair_fastq and not self.preserve_order:
            self.single_reads_mode = True
        self.revcomp_pair_file = (
            self.mode() in (MODE_PE, MODE_ORD_PE) and not self.disable_revcomp_pair
        )

    def max_mismatches(self) -> int:
        return self.read_len // self.min_chars_per_mismatch


def matching_chars_correction(pg_length: int) -> int:
    """Seed-length correction by pg size (ReadsMatchers.cpp:798-801)."""
    x = pg_length // 10_000_000
    return x.bit_length() if x else 0
