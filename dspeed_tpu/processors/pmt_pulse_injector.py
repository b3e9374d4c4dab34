"""PMT pulse injection re-exports (reference
``dspeed/processors/pmt_pulse_injector.py``); implementations live with the
other injectors in :mod:`.pulse_injector`."""

from .pulse_injector import inject_general_logistic, inject_gumbel

__all__ = ["inject_gumbel", "inject_general_logistic"]

# generic row-tile fusion (r5 audit): elementwise/reduce/small-matmul bodies
# with no scans, sorts, FFTs or per-row dynamic gathers — Mosaic-lowerable;
# the two-tile probe compile still guards every group at trace time
inject_gumbel.tile_safe = True
inject_general_logistic.tile_safe = True
