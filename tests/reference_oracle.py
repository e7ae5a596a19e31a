"""Import the reference pytorch_wavelets package (read-only, torch CPU) as a
numerical oracle.

The reference depends on pywt (filter tables + dwt_coeff_len) and
pkg_resources; neither is installed, so both are shimmed: pywt from our own
filter construction, pkg_resources from plain open().  Nothing from the
reference is copied — it is executed as a black-box oracle, mirroring the
reference's own test strategy of comparing against an independent
implementation (reference tests/test_dwt.py:75-81).
"""
import os
import sys
import types

_REF_PATH = "/root/reference"


def _install_shims():
    if "pywt" not in sys.modules:
        from pytorch_wavelets_tpu.filters import wavelet as _wavelet
        from pytorch_wavelets_tpu.utils import dwt_coeff_len

        pywt = types.ModuleType("pywt")

        class _W:
            def __init__(self, name):
                w = _wavelet(name)
                self.name = name
                self.dec_lo = list(w.dec_lo)
                self.dec_hi = list(w.dec_hi)
                self.rec_lo = list(w.rec_lo)
                self.rec_hi = list(w.rec_hi)
                self.dec_len = len(self.dec_lo)
                self.rec_len = len(self.rec_lo)

        pywt.Wavelet = _W
        pywt.dwt_coeff_len = dwt_coeff_len
        sys.modules["pywt"] = pywt

    if "pkg_resources" not in sys.modules:
        pr = types.ModuleType("pkg_resources")

        def resource_stream(pkg, name):
            return open(_REF_PATH + "/" + pkg.replace(".", "/") + "/" + name,
                        "rb")

        pr.resource_stream = resource_stream
        sys.modules["pkg_resources"] = pr


def load_reference():
    """Returns (torch, pytorch_wavelets) with shims installed.

    Under pytest, a *missing* reference checkout (e.g. hosted CI) skips the
    calling test.  Any other failure — a broken shim, a torch import error
    on a machine that does have the checkout — propagates, so a regression
    in the oracle plumbing cannot silently turn the parity suite green."""
    if not os.path.isdir(os.path.join(_REF_PATH, "pytorch_wavelets")):
        if "pytest" in sys.modules:
            import pytest
            pytest.skip("reference package unavailable")
        raise FileNotFoundError(f"reference checkout not found at {_REF_PATH}")
    _install_shims()
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    import torch  # noqa: F401
    import pytorch_wavelets  # noqa: F401
    return torch, pytorch_wavelets
