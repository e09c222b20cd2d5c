from .testing import allclose_rel, max_rel_err, snr_db

__all__ = ["allclose_rel", "max_rel_err", "snr_db"]
