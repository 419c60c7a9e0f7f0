"""Unit tests for tools/scaling_report.py's classification logic.

The timing sweep itself is exercised out-of-band (SCALING.md is
regenerated at round close); these pin the verdict boundaries so a
refactor can't silently reclassify a super-linear query as healthy.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scaling():
    spec = importlib.util.spec_from_file_location(
        "scaling_report", os.path.join(ROOT, "tools", "scaling_report.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_errored_when_either_side_failed(scaling):
    assert scaling._verdict(-1.0, 5.0) == "errored"
    assert scaling._verdict(5.0, -1.0) == "errored"


def test_overhead_bound_under_one_second_at_large_sf(scaling):
    # even a 50x ratio is noise when the large-SF time is sub-second
    assert scaling._verdict(0.01, 0.5) == "overhead-bound"


def test_sub_linear_up_to_3x(scaling):
    assert scaling._verdict(1.0, 2.9) == "sub-linear"


def test_linear_band_3_to_12(scaling):
    assert scaling._verdict(1.0, 3.1) == "~linear"
    assert scaling._verdict(1.0, 12.0) == "~linear"


def test_super_linear_above_12(scaling):
    assert scaling._verdict(1.0, 12.1) == "SUPER-LINEAR"
    # sub-second exemption must NOT apply once t10 >= 1 s
    assert scaling._verdict(0.05, 1.5) == "SUPER-LINEAR"


def test_sf_of_parses_dir_names(scaling):
    assert scaling._sf_of("/root/testdata/sf0.01") == 0.01
    assert scaling._sf_of("/root/testdata/sf0.1/") == 0.1
