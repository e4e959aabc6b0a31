"""Golden-vector conformance fixtures.

The goldens under tests/golden/ are produced by tools/refgen — a generator
binary compiled from the REFERENCE implementation (srsRAN Project at
/root/reference) — in the reference's file_vector binary format
(include/srsran/support/file_vector.h:63-81).  Each suite directory carries
a manifest.json listing the cases.  Regenerate with:

    make -C tools/refgen && tools/refgen/build/refgen tests/golden
"""

import json
import os

import pytest

GOLDEN_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def load_suite(name):
    path = os.path.join(GOLDEN_ROOT, name, "manifest.json")
    if not os.path.exists(path):
        pytest.skip(f"golden suite {name!r} not generated (run tools/refgen)")
    with open(path) as f:
        return json.load(f)


def suite_path(name, fname):
    return os.path.join(GOLDEN_ROOT, name, fname)
