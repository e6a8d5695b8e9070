"""Parity tests for the shrink core: HSIC, ranking masks, analytic MACs."""

import jax.numpy as jnp
import numpy as np
import torch

from devit_tpu.core import hsic as H
from devit_tpu.core import metrics as M
from devit_tpu.core.rank import build_gates, check_sparsity, _mask_from_rank
from devit_tpu.core.shrink import screen, policies_to_gates

RNG = np.random.default_rng(1)


def torch_hsic(x, y, y_kernel, mean_sub):
    """Fixture re-deriving reference imp_rank.py:203-239 semantics in torch."""
    x, y = torch.tensor(x), torch.tensor(y)
    if mean_sub:
        x = x - x.mean(dim=0) / (x.std(dim=0, unbiased=True) + 1e-12)
        y = y - y.mean(dim=0)

    def gauss(a, sigma):
        inner = a @ a.t()
        n = torch.diag(inner)
        d2 = n + n.reshape(-1, 1) - 2 * inner
        return torch.exp(-d2 / (2 * sigma**2))

    def center(g):
        return g - g.mean(dim=0, keepdim=True) - g.mean(dim=1, keepdim=True) + g.mean()

    gx = center(sum(gauss(x, s) for s in (1, 2, 4, 8, 16)) / 5)
    if y_kernel == "linear":
        gy = center(y @ y.t())
    else:
        gy = center(sum(gauss(y, s) for s in (1, 2, 4, 8, 16)) / 5)
    return torch.trace(gx @ gy).item()


def test_hsic_relevance_matches_torch():
    x = RNG.normal(size=(16, 24)).astype(np.float32)
    y = RNG.normal(size=(16, 10)).astype(np.float32)
    y = np.exp(y) / np.exp(y).sum(-1, keepdims=True)
    ours = float(H.hsic(jnp.asarray(x), jnp.asarray(y), y_kernel="linear", mean_sub=True))
    ref = torch_hsic(x, y, "linear", True)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_hsic_redundancy_matches_torch():
    a = RNG.normal(size=(16, 24)).astype(np.float32)
    b = RNG.normal(size=(16, 24)).astype(np.float32)
    ours = float(H.hsic(jnp.asarray(a), jnp.asarray(b), y_kernel="rbf", mean_sub=False))
    ref = torch_hsic(a, b, "rbf", False)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_hsic_vmapped_consistency():
    xs = RNG.normal(size=(6, 16, 24)).astype(np.float32)
    y = RNG.normal(size=(16, 10)).astype(np.float32)
    many = H.hsic_relevance_many(jnp.asarray(xs), jnp.asarray(y))
    single = [float(H.hsic(jnp.asarray(x), jnp.asarray(y), y_kernel="linear", mean_sub=True)) for x in xs]
    np.testing.assert_allclose(many, single, rtol=1e-4)
    red = H.hsic_redundancy_matrix(jnp.asarray(xs))
    assert red.shape == (6, 6)
    np.testing.assert_allclose(red, np.asarray(red).T, rtol=1e-3, atol=1e-3)


def test_mask_from_rank_semantics():
    """num_keep = int(width*(1-ratio)); keeps the END of the ascending rank
    (imp_rank.py:55-58)."""
    rank = np.array([3, 0, 2, 1])  # ascending importance: 3 least, 1 most
    mask = _mask_from_rank(rank, 4, 0.5)
    np.testing.assert_array_equal(mask, [0, 1, 1, 0])  # keeps ids 1 and 2


def test_build_gates_sparsity_roundtrip():
    L_, hid, H_ = 4, 16, 4
    n_rank = np.stack([RNG.permutation(hid) for _ in range(L_)])
    h_rank = np.stack([RNG.permutation(H_) for _ in range(L_)])
    n_sp = [0.25, 0.5, 0.0, 0.75]
    h_sp = [0.5, 0.0, 0.25, 0.5]
    gates = build_gates(n_rank, h_rank, n_sp, h_sp)
    got_n, got_h = check_sparsity(gates)
    # int() floor means realized sparsity = 1 - int(w*(1-r))/w
    exp_n = [1 - int(hid * (1 - r)) / hid for r in n_sp]
    exp_h = [1 - int(H_ * (1 - r)) / H_ for r in h_sp]
    np.testing.assert_allclose(got_n, exp_n)
    np.testing.assert_allclose(got_h, exp_h)


def test_macs_formula_reference_anchor():
    """The reference's 9.19 'GMACs' anchor (shrink_imp.py:144) is actually the
    full dedeit GFLOPs — its MACs function returns flops/2 = 4.6G. We keep the
    anchor verbatim for workload parity; this pins both facts."""
    zeros = [0.0] * 12
    flops = M.cal_shrink_flops(zeros, zeros, emb=384, seq_length=197, mlp_ratio=4, head=6, layer=12)
    macs = M.cal_shrink_macs(zeros, zeros, emb=384, seq_length=197, mlp_ratio=4, head=6, layer=12)
    assert abs(flops - 9.19) < 0.05, flops
    assert abs(macs - 9.19 / 2) < 0.05, macs


def test_macs_monotone_in_sparsity():
    zeros = [0.0] * 12
    half = [0.5] * 12
    assert M.cal_shrink_macs(half, half, emb=384, head=6) < M.cal_shrink_macs(
        zeros, zeros, emb=384, head=6
    )
    assert M.cal_shrink_paras(half, half, emb=384, head=6) < M.cal_shrink_paras(
        zeros, zeros, emb=384, head=6
    )


def test_screen_respects_constraint():
    target = 0.3 * 9.19
    pop = screen(target, 3, 0.0, 0.9, 12, seed=0)
    assert len(pop) == 3
    for ratio in pop:
        macs = M.cal_shrink_macs(ratio[:12], ratio[12:], emb=384, head=6, seq_length=197)
        assert abs(macs - target) <= 0.02 * target


def test_policies_to_gates_shapes():
    L_, hid, H_ = 12, 64, 6
    n_rank = np.stack([RNG.permutation(hid) for _ in range(L_)])
    h_rank = np.stack([RNG.permutation(H_) for _ in range(L_)])
    pols = [[0.3] * 24, [0.5] * 24]
    g = policies_to_gates(pols, n_rank, h_rank, L_)
    assert g.head.shape == (2, L_, H_)
    assert g.neuron.shape == (2, L_, hid)
