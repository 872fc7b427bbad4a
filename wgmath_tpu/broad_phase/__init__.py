"""Broad phases (≙ wgparry/src/broad_phase)."""

from wgmath_tpu.broad_phase.brute_force import PairList, find_pairs  # noqa: F401
