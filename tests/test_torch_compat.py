"""Drop-in parity of the torch compat layer vs the reference package.

Both sides are torch-in/torch-out here: the compat modules
(pytorch_wavelets_tpu.compat.torch) are compared against the actual
reference modules on identical tensors — values, output structures, and
input gradients (through the JAX-VJP autograd bridge).
"""
import numpy as np
import pytest

import jax.tree_util as jtu

from tests.reference_oracle import load_reference

ATOL = 1e-5
GTOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def compat(ref):
    # import after the oracle shims are installed (pywt etc.)
    from pytorch_wavelets_tpu.compat import torch as compat_torch
    return compat_torch


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _run_with_grad(torch, module, x_np, weight_seed=7):
    """Apply module, return (outputs, input grad) under a fixed random
    linear loss so every output leaf contributes to the gradient."""
    x = torch.from_numpy(x_np.copy()).requires_grad_(True)
    out = module(x)
    leaves = jtu.tree_leaves(out)
    rng = np.random.RandomState(weight_seed)
    loss = sum(
        (t * torch.from_numpy(rng.randn(*t.shape).astype(np.float32))).sum()
        for t in leaves)
    loss.backward()
    return out, x.grad.numpy()


def _assert_tree_close(out, ref_out, atol=ATOL):
    a_leaves, a_tree = jtu.tree_flatten(out)
    b_leaves, b_tree = jtu.tree_flatten(ref_out)
    assert a_tree == b_tree, (a_tree, b_tree)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_allclose(a.detach().numpy(), b.detach().numpy(),
                                   atol=atol)


@pytest.mark.parametrize("mode", ["zero", "symmetric", "periodization"])
def test_dwt2d_parity_and_grads(ref, compat, mode):
    torch, pw = ref
    x = _rand((2, 3, 31, 33))
    ours, g_ours = _run_with_grad(
        torch, compat.DWTForward(J=2, wave="db3", mode=mode), x)
    theirs, g_ref = _run_with_grad(
        torch, pw.DWTForward(J=2, wave="db3", mode=mode), x)
    _assert_tree_close(ours, theirs)
    np.testing.assert_allclose(g_ours, g_ref, atol=GTOL)

    # inverse parity + grads, driven from the reference's coefficients
    yl, yh = theirs
    coeffs = (yl.detach(), [h.detach() for h in yh])
    rec_ours, rec_ref = (compat.DWTInverse(wave="db3", mode=mode)(coeffs),
                         pw.DWTInverse(wave="db3", mode=mode)(coeffs))
    np.testing.assert_allclose(rec_ours.detach().numpy(),
                               rec_ref.detach().numpy(), atol=ATOL)


def test_dwt1d_parity(ref, compat):
    torch, pw = ref
    x = _rand((2, 3, 101))
    ours, g_ours = _run_with_grad(
        torch, compat.DWT1DForward(J=3, wave="sym4"), x)
    theirs, g_ref = _run_with_grad(
        torch, pw.DWT1DForward(J=3, wave="sym4"), x)
    _assert_tree_close(ours, theirs)
    np.testing.assert_allclose(g_ours, g_ref, atol=GTOL)
    coeffs = (theirs[0].detach(), [h.detach() for h in theirs[1]])
    np.testing.assert_allclose(
        compat.DWT1DInverse(wave="sym4")(coeffs).detach().numpy(),
        pw.DWT1DInverse(wave="sym4")(coeffs).detach().numpy(), atol=ATOL)


def test_swt_parity_and_inverse(ref, compat):
    torch, _ = ref
    from pytorch_wavelets.dwt.transform2d import SWTForward as RefSWT
    x = _rand((1, 2, 32, 32))
    # the reference SWT only works at J=1 and returns channel-interleaved
    # (N, 4C, H, W); we keep its *documented* (N, C, 4, H, W) contract
    y_ref = RefSWT(J=1, wave="db2", mode="symmetric")(
        torch.from_numpy(x.copy()))[0].reshape(1, 2, 4, 32, 32)
    y_ours = compat.SWTForward(J=1, wave="db2", mode="symmetric")(
        torch.from_numpy(x.copy()))[0]
    np.testing.assert_allclose(y_ours.detach().numpy(), y_ref.numpy(),
                               atol=ATOL)
    # the reference's SWTInverse is dead code (SURVEY §2.3); ours works —
    # pin a multilevel round-trip through the compat layer
    coeffs = compat.SWTForward(J=2, wave="db2", mode="symmetric")(
        torch.from_numpy(x.copy()))
    rec = compat.SWTInverse(wave="db2", mode="symmetric")(coeffs)
    np.testing.assert_allclose(rec.detach().numpy(), x, atol=1e-4)


def test_dtcwt_parity_and_grads(ref, compat):
    torch, pw = ref
    x = _rand((2, 3, 30, 30))
    ours, g_ours = _run_with_grad(torch, compat.DTCWTForward(J=2), x)
    theirs, g_ref = _run_with_grad(torch, pw.DTCWTForward(J=2), x)
    _assert_tree_close(ours, theirs)
    np.testing.assert_allclose(g_ours, g_ref, atol=GTOL)

    yl, yh = theirs
    coeffs = (yl.detach(), [h.detach() for h in yh])
    rec_ours = compat.DTCWTInverse()(coeffs)
    rec_ref = pw.DTCWTInverse()(coeffs)
    np.testing.assert_allclose(rec_ours.detach().numpy(),
                               rec_ref.detach().numpy(), atol=ATOL)


def test_dtcwt_inverse_grads(ref, compat):
    torch, pw = ref
    x = _rand((1, 2, 24, 24))
    yl, yh = pw.DTCWTForward(J=2)(torch.from_numpy(x.copy()))
    coeffs = (yl.detach(), [h.detach() for h in yh])

    def run(inv):
        c = (coeffs[0].clone().requires_grad_(True),
             [h.clone().requires_grad_(True) for h in coeffs[1]])
        (inv(c) ** 2).sum().backward()
        return [c[0].grad.numpy()] + [h.grad.numpy() for h in c[1]]

    for a, b in zip(run(compat.DTCWTInverse()), run(pw.DTCWTInverse())):
        np.testing.assert_allclose(a, b, atol=GTOL)


def test_dtcwt_skip_hps_include_scale_structure(ref, compat):
    torch, pw = ref
    x = _rand((1, 2, 32, 32))
    kw = dict(J=3, skip_hps=[True, False, False], include_scale=True)
    ours = compat.DTCWTForward(**kw)(torch.from_numpy(x.copy()))
    theirs = pw.DTCWTForward(**kw)(torch.from_numpy(x.copy()))
    # include_scale returns (yscale list, yh list); the skipped level is a
    # 0-dim placeholder exactly like the reference's
    assert isinstance(ours, tuple) and len(ours) == 2
    for a, b in zip(jtu.tree_leaves(ours), jtu.tree_leaves(theirs)):
        assert tuple(a.shape) == tuple(b.shape)
        if a.numel():
            np.testing.assert_allclose(a.detach().numpy(),
                                       b.detach().numpy(), atol=ATOL)
    # drop-in interop both ways: our coefficients drive the REFERENCE
    # inverse, and the reference's placeholders drive OUR inverse
    _, yh = ours
    rec_ref = pw.DTCWTInverse()((ours[0][-1].detach(),
                                 [h.detach() for h in yh]))
    rec_ours = compat.DTCWTInverse()((theirs[0][-1].detach(),
                                      [h.detach() for h in theirs[1]]))
    np.testing.assert_allclose(rec_ours.detach().numpy(),
                               rec_ref.detach().numpy(), atol=ATOL)


def test_scatlayer_parity_and_grads(ref, compat):
    torch, pw = ref
    x = _rand((2, 3, 32, 32))
    ours, g_ours = _run_with_grad(torch, compat.ScatLayer(), x)
    theirs, g_ref = _run_with_grad(torch, pw.ScatLayer(), x)
    np.testing.assert_allclose(ours.detach().numpy(),
                               theirs.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(g_ours, g_ref, atol=GTOL)


def test_scatlayerj2_parity(ref, compat):
    torch, pw = ref
    x = _rand((1, 3, 32, 32))
    ours = compat.ScatLayerj2()(torch.from_numpy(x.copy()))
    theirs = pw.ScatLayerj2()(torch.from_numpy(x.copy()))
    np.testing.assert_allclose(ours.detach().numpy(),
                               theirs.detach().numpy(), atol=ATOL)


def test_module_ergonomics(ref, compat):
    torch, _ = ref
    m = compat.DWTForward(J=1, wave="haar")
    # torch.nn.Module conventions a migrating user relies on
    assert isinstance(m, torch.nn.Module)
    assert "DWTForward" in repr(type(m)())
    yl, yh = m(torch.zeros(1, 1, 8, 8))
    assert isinstance(yh, list) and yl.dtype == torch.float32
    # aliases from the reference package root
    assert compat.DWT2D is compat.DWTForward
    assert compat.IDTCWT is compat.DTCWTInverse
    with pytest.raises(TypeError):
        m(np.zeros((1, 1, 8, 8)))


def test_no_grad_path(ref, compat):
    torch, _ = ref
    with torch.no_grad():
        yl, yh = compat.DWTForward(J=1)(torch.randn(1, 1, 16, 16))
    assert not yl.requires_grad


def test_pickle_and_deepcopy(ref, compat, tmp_path):
    """torch.save/torch.load of whole modules and deepcopy both work —
    the unpicklable jit bridge is rebuilt on load."""
    import copy
    torch, _ = ref
    m = compat.DTCWTForward(J=2)
    x = torch.from_numpy(_rand((1, 2, 16, 16)))
    yl, _ = m(x)
    p = tmp_path / "m.pt"
    torch.save(m, p)
    m2 = torch.load(p, weights_only=False)
    yl2, _ = m2(x)
    np.testing.assert_allclose(yl2.numpy(), yl.detach().numpy(), atol=0)
    m3 = copy.deepcopy(m)
    yl3, _ = m3(x)
    np.testing.assert_allclose(yl3.numpy(), yl.detach().numpy(), atol=0)
    assert len(m.state_dict()) == 0  # no parameters to migrate


def test_shared_jit_cache_across_instances(ref, compat):
    """Fresh equal-config instances reuse the same compiled program (the
    jit caches key on the value-equal model config, not the wrapper)."""
    import time
    torch, _ = ref
    x = torch.from_numpy(_rand((1, 2, 64, 64)))
    compat.DTCWTForward(J=2)(x)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        compat.DTCWTForward(J=2)(x)  # fresh instances every call
    warm = (time.perf_counter() - t0) / 3
    assert warm < 1.0, f"fresh-instance call took {warm:.2f}s — retraced?"


def test_loads_reference_checkpoints(ref, compat):
    """A state_dict saved from a network built on REFERENCE wavelet
    modules (which register filter buffers) loads strict into the same
    network built on compat modules."""
    torch, pw = ref

    def net(mod):
        class Net(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.head = torch.nn.Conv2d(3, 3, 1)
                self.wav = mod.DWTForward(J=2, wave="db2")
                self.dt = mod.DTCWTForward(J=1)
            def forward(self, x):
                yl, _ = self.wav(self.head(x))
                return yl
        return Net()

    ref_net, our_net = net(pw), net(compat)
    sd = ref_net.state_dict()
    assert any("wav" in k for k in sd)  # reference registered buffers
    our_net.load_state_dict(sd)  # strict=True: must consume wavelet keys
    x = torch.from_numpy(_rand((1, 3, 16, 16)))
    np.testing.assert_allclose(our_net(x).detach().numpy(),
                               ref_net(x).detach().numpy(), atol=ATOL)


def test_partial_requires_grad(ref, compat):
    """Backward returns grads only for inputs that require them and they
    match the reference (needs-masked VJP)."""
    torch, pw = ref
    x = _rand((1, 2, 16, 16))
    yl_r, yh_r = pw.DTCWTForward(J=2)(torch.from_numpy(x.copy()))

    def run(inv_cls):
        yl = yl_r.detach().clone().requires_grad_(True)
        yh = [h.detach().clone() for h in yh_r]  # frozen highpasses
        (inv_cls()((yl, yh)) ** 2).sum().backward()
        return yl.grad.numpy()
    np.testing.assert_allclose(run(compat.DTCWTInverse),
                               run(pw.DTCWTInverse), atol=GTOL)


# ---------------------------------------------------------------------------
# The dlpack staging contract (compat/torch.py:_to_jax/_to_torch) — the
# dangerous aliasing sequences, pinned (VERDICT r4 task 4).  Zero-copy
# bridging is only acceptable if every in-place hazard either errors
# loudly or is provably isolated; these tests are that proof.
# ---------------------------------------------------------------------------

def test_inplace_input_mutation_between_fwd_and_bwd_errors(ref, compat):
    """Mutating the input in place after forward must NOT silently corrupt
    gradients: the bridge re-stages saved tensors at backward time, and
    torch's saved-tensor version counter turns that into a loud
    RuntimeError (same failure mode as the reference's own modules)."""
    torch, _ = ref
    x = torch.from_numpy(_rand((1, 2, 16, 16))).requires_grad_(True)
    yl, yh = compat.DTCWTForward(J=1)(x)
    loss = yl.sum() + yh[0].sum()
    with torch.no_grad():
        x.mul_(2.0)
    with pytest.raises(RuntimeError, match="inplace"):
        loss.backward()


def test_outputs_never_alias_inputs(ref, compat):
    """Returned tensors must own distinct storage even when the jitted
    program is an identity on the input (J=0 passthrough): mutating an
    output in place must never write through to the caller's tensor."""
    torch, _ = ref
    z = torch.from_numpy(_rand((1, 2, 16, 16)))
    z0 = z.clone()
    yl, yh = compat.DTCWTForward(J=0)(z)
    assert yl.data_ptr() != z.data_ptr()
    with torch.no_grad():
        yl.add_(100.0)
    assert torch.equal(z, z0)


def test_inplace_output_mutation_does_not_poison_later_forwards(ref, compat):
    """Clobbering a returned tensor in place, then re-running the same
    module on the same input, must reproduce the pre-clobber values (the
    bridge must never hand out a buffer shared with an XLA cache)."""
    torch, _ = ref
    m = compat.DTCWTForward(J=1)
    w = torch.from_numpy(_rand((1, 1, 16, 16)))
    yl, _ = m(w)
    want = yl.clone()
    with torch.no_grad():
        yl.mul_(0.0)
    yl2, _ = m(w)
    assert torch.equal(yl2, want)


def test_input_mutation_after_nograd_forward_leaves_outputs_intact(
        ref, compat):
    """The forward stages zero-copy from torch memory; by return time the
    outputs must be materialized, so later input mutation can't reach
    them."""
    torch, _ = ref
    m = compat.DTCWTForward(J=1)
    x = torch.from_numpy(_rand((1, 1, 16, 16)))
    with torch.no_grad():
        yl, _ = m(x)
        want = yl.clone()
        x.fill_(0.0)
    assert torch.equal(yl, want)


def test_bridged_outputs_survive_torch_save_load(ref, compat, tmp_path):
    torch, _ = ref
    yl, yh = compat.DTCWTForward(J=2)(torch.from_numpy(_rand((1, 2, 16, 16))))
    p = str(tmp_path / "coeffs.pt")
    torch.save((yl, yh), p)
    lyl, lyh = torch.load(p)
    assert torch.equal(lyl, yl)
    for a, b in zip(lyh, yh):
        assert torch.equal(a, b)


def test_noncontiguous_and_bf16_inputs(ref, compat):
    """Non-contiguous inputs are staged via a contiguous copy; bf16 via a
    float32 copy — both must match the contiguous-f32 result (and bf16
    gradients must flow)."""
    torch, _ = ref
    m = compat.DTCWTForward(J=1)
    base = torch.from_numpy(_rand((1, 2, 24, 16)))
    yl_a, _ = m(base)
    # a genuinely non-contiguous tensor holding the same values
    perm = base.permute(0, 1, 3, 2).contiguous().permute(0, 1, 3, 2)
    assert not perm.is_contiguous()
    yl_c, _ = m(perm)
    assert torch.allclose(yl_a, yl_c, atol=1e-6)
    # bf16: forward + backward both run; values near the f32 result
    xb = base.to(torch.bfloat16).requires_grad_(True)
    yl_d, yh_d = m(xb)
    (yl_d.sum() + yh_d[0].sum()).backward()
    assert xb.grad is not None and torch.isfinite(xb.grad.float()).all()
    assert torch.allclose(yl_d.float(), yl_a, atol=0.15, rtol=0.05)
