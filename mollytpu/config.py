"""Configuration: strictness levels and the environment-flag registry.

Reference parity: the `MOLLY_STRICTNESS` env var + `report_issue` machinery
(/root/reference/src/types.jl:1924-1945) that setup-time validation
(force-field parsing, residue/patch matching, system building) routes
recoverable problems through, and the reference's scattered feature flags —
here collected into one documented registry so `MOLLYTPU_*` behaves as a
system rather than folklore.

Strictness levels (env ``MOLLYTPU_STRICTNESS`` or per-call kwarg):
  - ``warn``   (default) — emit a warning and continue
  - ``nowarn``           — continue silently
  - ``error``            — raise ``ValueError``
"""

from __future__ import annotations

import os
import warnings

STRICTNESS_LEVELS = ("warn", "nowarn", "error")

#: Every environment flag the framework reads, with default and meaning.
#: (`describe_env()` renders this; README "Configuration" documents it.)
ENV_FLAGS = {
    "MOLLYTPU_STRICTNESS": (
        "warn", "setup-time issue handling: warn | nowarn | error"),
    "MOLLYTPU_BLOCK": (
        "128", "default Pallas i-cluster size (atoms per block); per-finder "
        "values from BlockPairFinder.setup(block=...) or the runtime "
        "autotuner take precedence"),
    "MOLLYTPU_LANES": (
        "256", "default Pallas j-gather chunk width; per-finder values take "
        "precedence"),
    "MOLLYTPU_AUTOTUNE": (
        "1", "launch-config autotune gate: bench.py and "
        "ops.autotune.tuned_block_pairs sweep unless =0 (results disk-"
        "cached; only the first run on a (machine, workload) pair pays)"),
    "MOLLYTPU_AUTOTUNE_VERBOSE": (
        "0", "print per-candidate timings during the autotune sweep"),
    "MOLLYTPU_AUTOTUNE_BUDGET": (
        "600", "wall-clock budget (s) for a cold tune_launch sweep; "
        "expansion stops early and keeps the best seen"),
    "MOLLYTPU_PME_HIGHEST": (
        "0", "force 6-pass (HIGHEST) MXU precision for the PME mesh "
        "contractions; default is 3-pass HIGH (~22-bit, validated by the "
        "on-device fidelity tier). The fractional-coordinate matmul is "
        "always 6-pass"),
    "MOLLYTPU_BENCH_MTS": (
        "0", "bench.py reports the BAOAB-RESPA MTS headline (PME recip "
        "x1/outer 4 fs) instead of the standard Langevin 2 fs metric"),
    "MOLLYTPU_CACHE_DIR": (
        "~/.cache/mollytpu", "on-disk cache root (system builds, autotune "
        "results)"),
    "MOLLYTPU_BUILD_CACHE": (
        "1", "system_from_pdb on-disk build cache (set 0 to disable)"),
    "MOLLYTPU_NO_MOMENT": (
        "0", "disable the MXU moment-form force accumulation in the Pallas "
        "kernel (debug fallback: direct per-pair accumulation)"),
    "MOLLYTPU_BENCH_SKIN": (
        "autotuned", "EXPLICIT bench.py neighbor-skin override (nm); unset "
        "means the joint autotuner picks it (anchor 0.15)"),
    "MOLLYTPU_BENCH_CADENCE": (
        "autotuned", "EXPLICIT bench.py rebuild-cadence override (steps); "
        "unset means the joint autotuner picks it (anchor 20)"),
}


def strictness(override: str | None = None) -> str:
    """Resolve the effective strictness level: per-call override if given,
    else ``MOLLYTPU_STRICTNESS``, else ``warn``."""
    level = override or os.environ.get("MOLLYTPU_STRICTNESS", "warn")
    level = level.lower()
    if level not in STRICTNESS_LEVELS:
        raise ValueError(
            f"strictness must be one of {STRICTNESS_LEVELS}, got {level!r}")
    return level


def report_issue(msg: str, level: str | None = None) -> None:
    """Handle a recoverable setup-time problem according to the strictness
    level (reference: report_issue, types.jl:1938-1945)."""
    level = strictness(level)
    if level == "error":
        raise ValueError(msg)
    if level == "warn":
        warnings.warn(msg, stacklevel=3)


def describe_env() -> str:
    """Human-readable table of every MOLLYTPU_* flag, its default and its
    current value."""
    lines = ["flag                        current    default    purpose"]
    for flag, (default, purpose) in sorted(ENV_FLAGS.items()):
        cur = os.environ.get(flag, "-")
        lines.append(f"{flag:<27} {cur:<10} {default:<10} {purpose}")
    return "\n".join(lines)
