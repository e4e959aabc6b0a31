"""3GPP NR constants and derived-parameter library.

Pure-Python/NumPy integer and table math (no JAX): numerology, slot timing,
PRB/RE geometry, modulation schemes, MCS/TBS tables, transport-block
segmentation parameters.  Mirrors the role of the reference's `lib/ran`
(see SURVEY.md §2 and reference include/srsran/ran/*).
"""

from .constants import (  # noqa: F401
    NRE,
    MAX_RB,
    MAX_PORTS,
    SubcarrierSpacing,
    CyclicPrefix,
    scs_khz,
    nof_symbols_per_slot,
    nof_slots_per_subframe,
    nof_slots_per_frame,
)
from .slot_point import SlotPoint  # noqa: F401
