"""Thin re-export: the f64 oracle moved into the package
(wgmath_tpu/testbed/oracle.py) so the testbed can offer it as a live
INDEPENDENT-engine backend (≙ the reference's rapier CPU backend switch,
src_testbed/backend/cpu.rs:27); tests keep their historical import path."""

from wgmath_tpu.testbed.oracle import *  # noqa: F401,F403
from wgmath_tpu.testbed.oracle import (  # noqa: F401
    ContactConstraint,
    OracleBody,
    OracleParams,
    SphericalJoint,
    ball_body,
    box_body,
    collect_contacts,
    oracle_step,
)
