#!/usr/bin/env python
"""Full-surface numerical battery: every transform family on the REAL TPU
chip vs the reference package (torch CPU, loaded from /root/reference via
tests.reference_oracle).  Prints one line per probe with the max abs error
and FAILS (exit 1) if any exceeds its tolerance.

Run:  python tools/tpu_oracle_battery.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TOL = 2e-4      # f32 HIGHEST vs torch f32, data scale ~unit
failures = []


def check(name, ours, theirs, tol=TOL):
    a = np.asarray(ours)
    b = theirs.detach().numpy() if hasattr(theirs, "detach") else \
        np.asarray(theirs)
    err = float(np.abs(a - b).max()) if a.size else 0.0
    status = "ok" if err <= tol else "FAIL"
    print(f"{status:4s} {name:55s} maxerr={err:.2e}")
    if err > tol:
        failures.append(name)


def main():
    import jax
    import jax.numpy as jnp
    import pytorch_wavelets_tpu as tw
    from tests.reference_oracle import load_reference

    torch, pw = load_reference()
    assert jax.default_backend() == "tpu", (
        "battery must run against the real chip")
    rng = np.random.RandomState(0)

    # ---- 2-D DWT: waves x modes x shapes (incl. odd) -------------------
    for wave in ("db1", "db3", "bior2.4"):
        for mode in ("zero", "symmetric", "reflect", "periodization"):
            for shape in ((2, 3, 64, 64), (1, 2, 63, 49)):
                x = rng.randn(*shape).astype(np.float32)
                fo = tw.DWTForward(J=2, wave=wave, mode=mode)
                fr = pw.DWTForward(J=2, wave=wave, mode=mode)
                yl, yh = jax.jit(lambda z: fo(z))(jnp.asarray(x))
                yl_r, yh_r = fr(torch.from_numpy(x))
                tag = f"dwt2d {wave}/{mode}/{shape[-2:]}"
                check(tag + " yl", yl, yl_r)
                for j in range(2):
                    check(f"{tag} yh[{j}]", yh[j], yh_r[j])
                io = tw.DWTInverse(wave=wave, mode=mode)
                ir = pw.DWTInverse(wave=wave, mode=mode)
                check(tag + " inv", jax.jit(lambda c: io(c))((yl, yh)),
                      ir((yl_r, yh_r)))

    # ---- 1-D DWT -------------------------------------------------------
    x = rng.randn(2, 3, 101).astype(np.float32)
    fo = tw.DWT1DForward(J=3, wave="db2", mode="symmetric")
    fr = pw.DWT1DForward(J=3, wave="db2", mode="symmetric")
    x0, hs = jax.jit(lambda z: fo(z))(jnp.asarray(x))
    x0r, hsr = fr(torch.from_numpy(x))
    check("dwt1d yl", x0, x0r)
    for j in range(3):
        check(f"dwt1d yh[{j}]", hs[j], hsr[j])
    io = tw.DWT1DInverse(wave="db2", mode="symmetric")
    ir = pw.DWT1DInverse(wave="db2", mode="symmetric")
    check("dwt1d inv", jax.jit(lambda c: io(c))((x0, hs)), ir((x0r, hsr)))

    # ---- SWT (the reference's SWTForward is unshipped and crashes for
    # every mode it claims to support — mypad rejects 'periodization' and
    # indexes a wrong rank under 'periodic' — so the oracle here is our own
    # conv-path implementation on CPU, which tests/test_swt.py pins) ------
    x = rng.randn(1, 2, 64, 64).astype(np.float32)
    fo = tw.SWTForward(J=2, wave="db2")
    got = jax.jit(lambda z: fo(z))(jnp.asarray(x))
    with jax.default_device(jax.devices("cpu")[0]):
        want = fo(jnp.asarray(x))
    for j in range(2):
        check(f"swt level {j} (tpu vs cpu conv)", got[j],
              np.asarray(want[j]))
    rec = jax.jit(lambda c: tw.SWTInverse(wave="db2")(c))(got)
    check("swt inverse PR", rec, x, tol=1e-4)

    # ---- DTCWT: filter banks, layouts, variants ------------------------
    for biort, qshift in (("near_sym_a", "qshift_a"),
                          ("near_sym_b", "qshift_b"),
                          ("antonini", "qshift_06"),
                          ("legall", "qshift_c")):
        for shape in ((1, 2, 64, 64), (1, 2, 63, 49)):
            x = rng.randn(*shape).astype(np.float32)
            fo = tw.DTCWTForward(J=3, biort=biort, qshift=qshift)
            fr = pw.DTCWTForward(J=3, biort=biort, qshift=qshift)
            yl, yh = jax.jit(lambda z: fo(z))(jnp.asarray(x))
            yl_r, yh_r = fr(torch.from_numpy(x))
            tag = f"dtcwt {biort}/{qshift}/{shape[-2:]}"
            check(tag + " yl", yl, yl_r)
            for j in range(3):
                check(f"{tag} yh[{j}]", yh[j], yh_r[j])
            io = tw.DTCWTInverse(biort=biort, qshift=qshift)
            ir = pw.DTCWTInverse(biort=biort, qshift=qshift)
            check(tag + " inv", jax.jit(lambda c: io(c))((yl, yh)),
                  ir((yl_r, yh_r)))

    # (DTCWTForward with the _bp banks is outside the reference envelope
    # too — its ctor unpacks a 4-tuple from biort() and would crash on the
    # 6-value near_sym_b_bp bank; the rot paths are exercised through the
    # ScatLayer probes below.)

    # skip_hps + include_scale + layouts
    x = rng.randn(1, 2, 64, 64).astype(np.float32)
    fo = tw.DTCWTForward(J=3, skip_hps=[True, False, False],
                         include_scale=True, o_dim=1, ri_dim=-1)
    fr = pw.DTCWTForward(J=3, skip_hps=[True, False, False],
                         include_scale=True, o_dim=1, ri_dim=-1)
    sc, yh = jax.jit(lambda z: fo(z))(jnp.asarray(x))
    sc_r, yh_r = fr(torch.from_numpy(x))
    for j in range(3):
        check(f"dtcwt scales[{j}]", sc[j], sc_r[j])
        if j > 0:
            check(f"dtcwt skip yh[{j}]", yh[j], yh_r[j])

    # o_dim/ri_dim layout sweep: forward vs reference everywhere; inverse
    # round-trip on the 7 layouts where the reference inverse crashes
    # (its get_dimensions6 mislabels H/W — docs/parity.md)
    x = rng.randn(1, 2, 32, 32).astype(np.float32)
    for o_dim, ri_dim in ((1, 2), (2, 3), (3, 1), (2, 4), (4, 1), (5, 3)):
        fo = tw.DTCWTForward(J=2, o_dim=o_dim, ri_dim=ri_dim)
        yl, yh = jax.jit(lambda z: fo(z))(jnp.asarray(x))
        tag = f"dtcwt layout o={o_dim} ri={ri_dim}"
        try:
            fr = pw.DTCWTForward(J=2, o_dim=o_dim, ri_dim=ri_dim)
            yl_r, yh_r = fr(torch.from_numpy(x))
            check(tag + " yl", yl, yl_r)
            check(tag + " yh[0]", yh[0], yh_r[0])
        except Exception:
            pass
        io = tw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)
        rec = jax.jit(lambda c: io(c))((yl, yh))
        check(tag + " roundtrip", rec, x, tol=1e-4)

    # quad analysis: separable path vs reference, single-conv variant
    # equal to the separable path on-chip
    from pytorch_wavelets_tpu.filters import qshift as _qshift
    from pytorch_wavelets_tpu.transforms.dtcwt_alt import (
        quad_afb2d, quad_afb2d_nonsep)
    h0a, h0b, _, _, h1a, h1b, _, _ = _qshift("qshift_a")
    x = rng.randn(1, 2, 64, 64).astype(np.float32)
    for mode in ("zero", "symmetric"):
        y1l, y1h = jax.jit(lambda z: quad_afb2d(
            z, h0a, h1a, h0b, h1b, mode))(jnp.asarray(x))
        y2l, y2h = jax.jit(lambda z: quad_afb2d_nonsep(
            z, h0a, h1a, h0b, h1b, mode))(jnp.asarray(x))
        check(f"quad nonsep==sep {mode} yl", y2l, np.asarray(y1l))
        check(f"quad nonsep==sep {mode} yh", y2h, np.asarray(y1h))

    # ---- ScatterNet -----------------------------------------------------
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    for kw in ({}, {"combine_colour": True},
               {"biort": "near_sym_b_bp", "qshift": "qshift_b_bp"}):
        mo = tw.ScatLayerj2(**kw)
        mr = pw.ScatLayerj2(**kw)
        tag = f"scatj2 {sorted(kw.keys())}"
        check(tag, jax.jit(lambda z: mo(z))(jnp.asarray(x)),
              mr(torch.from_numpy(x)), tol=5e-4)
    for kw in ({}, {"combine_colour": True},
               {"biort": "near_sym_b_bp"}):
        mo = tw.ScatLayer(**kw)
        mr = pw.ScatLayer(**kw)
        tag = f"scatj1 {sorted(kw.keys())}"
        check(tag, jax.jit(lambda z: mo(z))(jnp.asarray(x)),
              mr(torch.from_numpy(x)), tol=5e-4)

    # ---- round-3/4 numerics: dials, banded-LS ISWT, duck waves, dmey ----
    # coeff_dtype storage dial: bf16 bandpasses, inverse upcasts on the
    # dial signature (models/_base.py:upcast_bands)
    x = rng.randn(2, 2, 128, 128).astype(np.float32)
    fo = tw.DTCWTForward(J=2, coeff_dtype="bfloat16")
    io = tw.DTCWTInverse()
    rec = jax.jit(lambda z: io(fo(z)))(jnp.asarray(x))
    check("dtcwt coeff_dtype=bf16 round trip", rec, x, tol=2e-2)
    rec32 = jax.jit(lambda z: tw.DTCWTInverse()(tw.DTCWTForward(J=2)(z)))(
        jnp.asarray(x))
    check("dtcwt coeff_dtype=bf16 vs f32 path", rec, np.asarray(rec32),
          tol=2e-2)
    # batch_chunk dial: chunked == unchunked on chip
    yl_c, yh_c = jax.jit(
        lambda z: tw.DTCWTForward(J=2, batch_chunk=1)(z))(jnp.asarray(x))
    yl_u, yh_u = jax.jit(lambda z: tw.DTCWTForward(J=2)(z))(jnp.asarray(x))
    check("dtcwt batch_chunk fwd", yl_c, np.asarray(yl_u))
    check("dtcwt batch_chunk bands", yh_c[0], np.asarray(yh_u[0]))
    # banded normal-equations ISWT (non-circular mode past the 2048
    # dense wall, transforms/dwt.py:394)
    xw = rng.randn(1, 1, 8, 2304).astype(np.float32)
    fo = tw.SWTForward(J=1, wave="db2", mode="symmetric")
    co = jax.jit(lambda z: fo(z))(jnp.asarray(xw))
    rec = tw.SWTInverse(wave="db2", mode="symmetric")(co)
    check("swt banded-LS inverse W=2304", rec, xw, tol=1e-3)
    # duck-typed wavelet object == named wavelet vs the reference
    from pytorch_wavelets_tpu.filters import wavelet as _resolve

    class _Duck:
        def __init__(self, n):
            w = _resolve(n)
            self.name = n
            self.dec_lo, self.dec_hi = list(w.dec_lo), list(w.dec_hi)
            self.rec_lo, self.rec_hi = list(w.rec_lo), list(w.rec_hi)

    x = rng.randn(1, 2, 63, 65).astype(np.float32)
    yl, yh = jax.jit(
        lambda z: tw.DWTForward(J=2, wave=_Duck("db3"))(z))(jnp.asarray(x))
    yl_r, yh_r = pw.DWTForward(J=2, wave="db3")(torch.from_numpy(x))
    check("duck pywt.Wavelet DWT", yl, yl_r)
    # dmey: 62-tap FIR Meyer round trip at its documented ~1e-4 accuracy
    x = rng.randn(1, 1, 128, 128).astype(np.float32)
    rec = jax.jit(lambda z: tw.DWTInverse(wave="dmey", mode="periodization")(
        tw.DWTForward(J=2, wave="dmey", mode="periodization")(z)))(
        jnp.asarray(x))
    check("dmey round trip", rec, x, tol=5e-4)

    # ---- gradients: fwd VJP == reference backward ----------------------
    x = rng.randn(1, 2, 32, 32).astype(np.float32)
    fo = tw.DTCWTForward(J=2)
    fr = pw.DTCWTForward(J=2)

    def loss(z):
        yl, yh = fo(z)
        import jax.numpy as jnp
        return jnp.sum(yl ** 2) + sum(jnp.sum(h ** 2) for h in yh)

    g = jax.jit(jax.grad(loss))(jnp.asarray(x))
    xt = torch.from_numpy(x).requires_grad_(True)
    yl_r, yh_r = fr(xt)
    (yl_r.pow(2).sum() + sum(h.pow(2).sum() for h in yh_r)).backward()
    check("dtcwt grad", g, xt.grad, tol=5e-4)

    print(f"\n{'ALL OK' if not failures else 'FAILURES:'}",
          ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
