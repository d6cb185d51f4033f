"""Pallas kernel tests (interpret mode on CPU; the same kernels compile and
run on TPU — verified on hardware during development)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from plagnn_tpu.ops.pallas.spmm_kernels import (
    build_blocked_csr,
    build_pallas_graph,
    pallas_spmm_max,
    pallas_spmm_sum,
)


def make_graph(rng, n_real=200, e=900):
    src = rng.integers(0, n_real, e)
    dst = rng.integers(0, n_real, e)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    return pairs[:, 0], pairs[:, 1]


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(1)
    src, dst = make_graph(rng)
    n_pad, b, f = 256, 2, 512
    pg = build_pallas_graph(src, dst, n_pad, rows_per_block=128)
    x = jnp.asarray(rng.standard_normal((n_pad, b, f)).astype(np.float32))
    import collections

    adj = collections.defaultdict(list)
    for s_, d_ in zip(src, dst):
        adj[int(d_)].append(int(s_))
    return pg, x, adj, (src, dst)


def test_blocked_csr_roundtrip(setup):
    pg, _, adj, (src, dst) = setup
    bc = pg.fwd
    src_p = np.asarray(bc.src)
    dstl_p = np.asarray(bc.dst_local)
    blk_ptr = np.asarray(bc.blk_ptr)
    dummy = bc.n_pad_nodes - 1
    got = set()
    for i in range(bc.n_blocks):
        for e in range(blk_ptr[i], blk_ptr[i + 1]):
            # row-group padding slots carry a real dst row but a dummy src
            if dstl_p[e] < bc.rows_per_block and src_p[e] != dummy:
                got.add((int(src_p[e]), i * bc.rows_per_block + int(dstl_p[e])))
    assert got == set(zip(src.tolist(), dst.tolist()))

    # block lists are G-aligned and the arrays carry a T_E overrun tail
    assert np.all(np.diff(blk_ptr) % 8 == 0)
    assert len(src_p) >= blk_ptr[-1] + 1024


def test_pallas_max_forward(setup):
    pg, x, adj, _ = setup
    out = np.asarray(pallas_spmm_max(pg, x, interpret=True))
    xn = np.asarray(x)
    ref = np.zeros_like(xn)
    for d_, ss in adj.items():
        ref[d_] = xn[ss].max(0)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pallas_sum_forward_and_grad(setup):
    pg, x, adj, _ = setup
    out = np.asarray(pallas_spmm_sum(pg, x, interpret=True))
    xn = np.asarray(x)
    ref = np.zeros_like(xn)
    for d_, ss in adj.items():
        ref[d_] = xn[ss].sum(0)
    np.testing.assert_allclose(out, ref, atol=1e-4)

    gr = jax.grad(
        lambda xx: jnp.sum(jnp.sin(pallas_spmm_sum(pg, xx, interpret=True)))
    )(x)
    # d/dx sum(sin(Σ)) routes cos through the transpose
    cos = np.cos(ref)
    egr = np.zeros_like(xn)
    for d_, ss in adj.items():
        for s_ in ss:
            egr[s_] += cos[d_]
    np.testing.assert_allclose(np.asarray(gr), egr, atol=1e-4)


def test_pallas_max_grad(setup):
    pg, x, adj, _ = setup
    gr = np.asarray(
        jax.grad(lambda xx: jnp.sum(pallas_spmm_max(pg, xx, interpret=True) ** 2))(x)
    )
    xn = np.asarray(x)
    ref = np.zeros_like(xn)
    for d_, ss in adj.items():
        ref[d_] = xn[ss].max(0)
    egr = np.zeros_like(xn)
    b, f = x.shape[1], x.shape[2]
    for d_, ss in adj.items():
        for bb in range(b):
            for ff in range(f):
                s_best = ss[int(np.argmax(xn[ss, bb, ff]))]
                egr[s_best, bb, ff] += 2 * ref[d_, bb, ff]
    np.testing.assert_allclose(gr, egr, atol=1e-4)


@pytest.mark.parametrize(
    "b,f",
    [
        (2, 1024),  # lane 256: arg_lane 128 == hi_w (exact int16 pairing)
        (3, 1024),  # lane 384: arg_lane 256 > hi_w 128 (0xFFFF sentinel pad)
        (2, 512),   # lane 128: hi_w 0 (lo-only packing)
    ],
)
def test_pallas_max_grad_packing_branches(setup, b, f):
    """The packed-int16 argmax backward has three lane-split shapes; route a
    gradient through each and check against the dense argmax oracle."""
    pg, _, adj, _ = setup
    rng = np.random.default_rng(7)
    n_pad = pg.fwd.n_pad_nodes
    x = jnp.asarray(rng.standard_normal((n_pad, b, f)).astype(np.float32))
    gr = np.asarray(
        jax.grad(lambda xx: jnp.sum(pallas_spmm_max(pg, xx, interpret=True) ** 2))(x)
    )
    xn = np.asarray(x)
    egr = np.zeros_like(xn)
    for d_, ss in adj.items():
        mx = xn[ss].max(0)
        best = np.asarray(ss)[np.argmax(xn[ss], axis=0)]
        for bb in range(b):
            for ff in range(f):
                egr[best[bb, ff], bb, ff] += 2 * mx[bb, ff]
    np.testing.assert_allclose(gr, egr, atol=1e-4)


def _bf16_representable(rng, shape):
    """Values distinct after bf16 rounding, exactly representable in bf16."""
    n = int(np.prod(shape))
    vals = rng.permutation(n).astype(np.float32)
    return np.asarray(
        jnp.asarray(vals.reshape(shape)).astype(jnp.bfloat16).astype(jnp.float32)
    )


@pytest.mark.parametrize("b,f", [(4, 512), (2, 1024), (4, 1024)])
def test_pallas_bf16_max_forward(setup, b, f):
    """bf16 message mode: max is exact over the rounded inputs."""
    pg, _, adj, _ = setup
    rng = np.random.default_rng(11)
    n_pad = pg.fwd.n_pad_nodes
    xr = _bf16_representable(rng, (n_pad, b, f))
    out = pallas_spmm_max(pg, jnp.asarray(xr).astype(jnp.bfloat16),
                          interpret=True)
    assert out.dtype == jnp.bfloat16
    o32 = np.asarray(out.astype(jnp.float32))
    ref = np.zeros_like(xr)
    for d_, ss in adj.items():
        ref[d_] = xr[ss].max(0)
    np.testing.assert_array_equal(o32, ref)


def test_pallas_bf16_grad_matches_f32_routing(setup):
    """The bf16 backward (fused bf16 grad + int16 arg lanes) routes the same
    gradients as the f32 path when inputs/cotangents are bf16-representable."""
    pg, _, adj, _ = setup
    rng = np.random.default_rng(13)
    n_pad, b, f = pg.fwd.n_pad_nodes, 4, 512
    xr = jnp.asarray(_bf16_representable(rng, (n_pad, b, f)))
    w = jnp.asarray(rng.integers(1, 9, (n_pad, b, f)).astype(np.float32))

    def loss_bf(x):
        y = pallas_spmm_max(pg, x.astype(jnp.bfloat16), interpret=True)
        return jnp.sum(y.astype(jnp.float32) * w)

    def loss_f32(x):
        return jnp.sum(pallas_spmm_max(pg, x, interpret=True) * w)

    g_bf = np.asarray(jax.grad(loss_bf)(xr))
    g_32 = np.asarray(jax.grad(loss_f32)(xr))
    np.testing.assert_array_equal(g_bf, g_32)


def test_pallas_bf16_sum_f32_accumulate(setup):
    """bf16 sum keeps an f32 accumulator: error is one output rounding, not
    per-edge accumulation drift."""
    pg, _, adj, _ = setup
    rng = np.random.default_rng(17)
    n_pad, b, f = pg.fwd.n_pad_nodes, 4, 512
    xr = _bf16_representable(rng, (n_pad, b, f)) / 1024.0
    out = pallas_spmm_sum(pg, jnp.asarray(xr).astype(jnp.bfloat16),
                          interpret=True)
    ref = np.zeros_like(xr)
    for d_, ss in adj.items():
        ref[d_] = xr[ss].sum(0)
    ref_b = np.asarray(jnp.asarray(ref).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)), ref_b)


def test_pallas_bf16_stride_guard(setup):
    """bf16 rows are (16, stride/16) tiles: stride % 2048 is enforced."""
    pg, _, _, _ = setup
    x = jnp.zeros((pg.fwd.n_pad_nodes, 2, 512), jnp.bfloat16)  # stride 1024
    with pytest.raises(AssertionError, match="2048"):
        pallas_spmm_max(pg, x, interpret=True)


def test_packed_stride_alignment():
    from plagnn_tpu.models.batched import packed_stride

    # f32: B=10 folds flat-pack 5030->5120, 4000->4096, 3000->3072
    assert packed_stride(10, 503, 1024) == 5120
    assert packed_stride(10, 400, 1024) == 4096
    assert packed_stride(10, 300, 1024) == 3072
    # bf16: 2048 alignment -> 6144 / 4096 / 4096
    assert packed_stride(10, 503, 2048) == 6144
    assert packed_stride(10, 400, 2048) == 4096
    assert packed_stride(10, 300, 2048) == 4096
    for b, f, a in [(10, 503, 2048), (8, 512, 2048), (7, 300, 1024)]:
        assert packed_stride(b, f, a) % a == 0


def test_pick_rows_per_block():
    from plagnn_tpu.ops.pallas.spmm_kernels import (
        DEFAULT_R, pick_rows_per_block,
    )

    # PPI scale (24,064 padded nodes, B=10 x F_pad=512): must pick the
    # VMEM-safe DEFAULT_R, never the measured-crash R=128.
    assert pick_rows_per_block(24064, 10 * 512) == DEFAULT_R
    assert pick_rows_per_block(24064, 10 * 512) <= DEFAULT_R
    # huge stride: halve until the footprint fits
    assert pick_rows_per_block(24064, 32 * 1024) < DEFAULT_R
    # divisibility fallback: 24040 % 64 != 0 but % 8 == 0
    assert 24040 % pick_rows_per_block(24040, 1024) == 0
    with pytest.raises(ValueError):
        pick_rows_per_block(24041, 1024)  # not even 8-aligned


def _boundary_graph(n_pad):
    """Edges whose sources straddle both sides of the int16 ceiling so the
    argmax backward must route ids >= 2^15 correctly."""
    rng = np.random.default_rng(21)
    lo_src = rng.integers(0, 200, 60)
    hi_src = rng.integers(n_pad - 300, n_pad - 2, 60)  # ids > 32768
    src = np.concatenate([lo_src, hi_src])
    dst = rng.integers(0, 200, 120)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    return pairs[:, 0], pairs[:, 1]


@pytest.mark.parametrize("n_pad,dtype", [
    ((1 << 15), "float32"),          # packed int16 path, at the ceiling
    ((1 << 15) + 64, "float32"),     # unpacked int32 fallback, just past it
    ((1 << 15) + 64, "bfloat16"),    # bf16 routes through the f32 fallback
])
@pytest.mark.slow
def test_bwd_across_int16_node_ceiling(n_pad, dtype):
    """>2^15 padded nodes must fall back to the unpacked int32 backward
    instead of raising (VERDICT r2 weak #5), with correct gradient routing
    for source ids above 32768 (interpret mode)."""
    src, dst = _boundary_graph(n_pad)
    pg = build_pallas_graph(src, dst, n_pad, rows_per_block=64)
    rng = np.random.default_rng(23)
    b, f = 1, 1024 if dtype == "float32" else 2048
    # bf16-rounded normals: exactly representable in both dtypes (ties are
    # possible and fine — both the kernel and the oracle break them toward
    # the first source in (dst, src) sorted order)
    x32 = np.asarray(
        jnp.asarray(rng.standard_normal((n_pad, b, f)).astype(np.float32))
        .astype(jnp.bfloat16).astype(jnp.float32)
    )
    x = jnp.asarray(x32)
    if dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
    gr = np.asarray(jax.grad(
        lambda xx: jnp.sum(
            pallas_spmm_max(pg, xx, interpret=True).astype(jnp.float32) ** 2)
    )(x).astype(jnp.float32))

    import collections

    adj = collections.defaultdict(list)
    for s_, d_ in zip(src, dst):
        adj[int(d_)].append(int(s_))
    egr = np.zeros_like(x32)
    for d_, ss in adj.items():
        mx = x32[ss].max(0)
        best = np.asarray(ss)[np.argmax(x32[ss], axis=0)]
        for bb in range(b):
            for ff in range(f):
                egr[best[bb, ff], bb, ff] += 2 * mx[bb, ff]
    np.testing.assert_allclose(gr, egr, atol=1e-3)


def test_pallas_matches_xla_path(setup):
    """Cross-check vs the bucketed-ELL XLA implementation."""
    pg, x, adj, (src, dst) = setup
    from plagnn_tpu.ops import build_graph, spmm_max

    g = build_graph(src, dst, 200, node_multiple=256, edge_multiple=64)
    assert g.n_nodes == 256
    xn = np.asarray(x)
    for b in range(x.shape[1]):
        ref = np.asarray(spmm_max(g, jnp.asarray(xn[:, b])))
        out = np.asarray(pallas_spmm_max(pg, x, interpret=True))[:, b]
        np.testing.assert_allclose(out, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Hub-cache (VMEM arena) stream split.
# ---------------------------------------------------------------------------


def _hub_graph(rng, n_real=200, e=3000, n_hot=5, frac=0.3):
    """Random graph with a few hot sources, so the hub stream is non-trivial."""
    src = rng.integers(0, n_real, e)
    dst = rng.integers(0, n_real, e)
    hot = rng.integers(0, n_hot, e)
    src = np.where(rng.random(e) < frac, hot, src)
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _tie_heavy(rng, n_pad, b, f):
    """relu'd, coarsely quantized values: per-lane cross-row ties are common,
    the regime where the hub merge's tie rule must reproduce
    first-maximum-in-sorted-order argmax exactly."""
    x = np.maximum(rng.standard_normal((n_pad, b, f)), 0)
    return ((x * 4).round() / 4).astype(np.float32)


def test_hub_stream_split_roundtrip():
    rng = np.random.default_rng(7)
    src, dst = _hub_graph(rng)
    n_pad = 256
    bc = build_blocked_csr(src, dst, n_pad, rows_per_block=64, hub_k=8)
    hub = bc.hub
    assert hub is not None and hub.k == 8
    ids = np.asarray(hub.ids)
    assert ids[-1] == n_pad - 1  # identity/dummy slot appended

    def edges(blk_ptr, vals, dstl, r, pad_val):
        blk_ptr, vals, dstl = map(np.asarray, (blk_ptr, vals, dstl))
        out = []
        for i in range(len(blk_ptr) - 1):
            for p in range(blk_ptr[i], blk_ptr[i + 1]):
                if dstl[p] < r and vals[p] != pad_val:
                    out.append((int(vals[p]), i * r + int(dstl[p])))
        return out

    reg = edges(bc.blk_ptr, bc.src, bc.dst_local, 64, n_pad - 1)
    hu = [(int(ids[s]), d)
          for s, d in edges(hub.blk_ptr, hub.slot, hub.dstl, 64, hub.k)]
    assert len(hu) > 0  # the hot sources actually landed in the hub stream
    assert sorted(reg + hu) == sorted(zip(src.tolist(), dst.tolist()))
    # hub edges of each destination row are slot-listed in ascending global
    # id order (the within-group first-hit tie rule relies on it)
    blk_ptr, slot, dstl = map(np.asarray, (hub.blk_ptr, hub.slot, hub.dstl))
    for i in range(len(blk_ptr) - 1):
        rows = {}
        for p in range(blk_ptr[i], blk_ptr[i + 1]):
            if dstl[p] < 64 and slot[p] != hub.k:
                rows.setdefault(int(dstl[p]), []).append(int(ids[slot[p]]))
        for lst in rows.values():
            assert lst == sorted(lst)


@pytest.mark.slow
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_hub_max_exact_vs_single_stream(dt):
    rng = np.random.default_rng(8)
    src, dst = _hub_graph(rng)
    n_pad, b, f = 256, 4, 512
    x = jnp.asarray(_tie_heavy(rng, n_pad, b, f)).astype(dt)
    pg0 = build_pallas_graph(src, dst, n_pad, rows_per_block=64)
    pgh = build_pallas_graph(src, dst, n_pad, rows_per_block=64, hub_k=8)

    def loss(pg, x_):
        y = pallas_spmm_max(pg, x_, interpret=True).astype(jnp.float32)
        return jnp.sum(jnp.sin(y * 0.3))

    l0, g0 = jax.value_and_grad(lambda x_: loss(pg0, x_))(x)
    lh, gh = jax.value_and_grad(lambda x_: loss(pgh, x_))(x)
    y0 = pallas_spmm_max(pg0, x, interpret=True).astype(jnp.float32)
    yh = pallas_spmm_max(pgh, x, interpret=True).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(yh))
    np.testing.assert_array_equal(
        np.asarray(g0.astype(jnp.float32)), np.asarray(gh.astype(jnp.float32)))


def test_hub_sum_exact_vs_single_stream():
    rng = np.random.default_rng(9)
    src, dst = _hub_graph(rng)
    n_pad, b, f = 256, 2, 512
    # integer-valued input: reassociation-proof, so hub == non-hub exactly
    x = jnp.asarray(
        rng.integers(-4, 5, (n_pad, b, f)).astype(np.float32))
    pg0 = build_pallas_graph(src, dst, n_pad, rows_per_block=64)
    pgh = build_pallas_graph(
        src, dst, n_pad, rows_per_block=64, hub_k=8, hub_k_bwd=8)
    y0 = pallas_spmm_sum(pg0, x, interpret=True)
    yh = pallas_spmm_sum(pgh, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(yh))
    # sum VJP runs the transpose stream's hub split
    g0 = jax.grad(lambda x_: jnp.sum(
        pallas_spmm_sum(pg0, x_, interpret=True) ** 2))(x)
    gh = jax.grad(lambda x_: jnp.sum(
        pallas_spmm_sum(pgh, x_, interpret=True) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(gh))


@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_hub_max_bwd_stream_exact(dt):
    """The masked (argmax-routed) backward with a hub transpose stream:
    hub-destination fused rows come from the arena, the rest via DMA; the
    summed gradient must equal the single-stream path.  Integer-valued
    cotangents make the sum reassociation-proof, so equality is exact."""
    rng = np.random.default_rng(10)
    src, dst = _hub_graph(rng)
    n_pad, b, f = 256, 4, 512
    x = jnp.asarray(_tie_heavy(rng, n_pad, b, f)).astype(dt)
    w = jnp.asarray(rng.integers(1, 9, (n_pad, b, f)).astype(np.float32))
    pg0 = build_pallas_graph(src, dst, n_pad, rows_per_block=64)
    pgh = build_pallas_graph(
        src, dst, n_pad, rows_per_block=64, hub_k=8, hub_k_bwd=8)

    def loss(pg, x_):
        y = pallas_spmm_max(pg, x_.astype(dt), interpret=True)
        return jnp.sum(y.astype(jnp.float32) * w)

    x32 = x.astype(jnp.float32)
    g0 = jax.grad(lambda x_: loss(pg0, x_))(x32)
    gh = jax.grad(lambda x_: loss(pgh, x_))(x32)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(gh))


@pytest.mark.slow
def test_hub_max_bwd_big_node_fallback():
    """>2^15 padded nodes route the bf16 backward through the unpacked-f32
    kernel; the hub stream must ride along correctly there too."""
    rng = np.random.default_rng(11)
    src, dst = _hub_graph(rng, n_real=300, e=2000)
    n_pad = (1 << 15) + 64
    x_small = _tie_heavy(rng, 300, 2, 1024)
    x = np.zeros((n_pad, 2, 1024), np.float32)
    x[:300] = x_small
    x = jnp.asarray(x, jnp.bfloat16)
    pg0 = build_pallas_graph(src, dst, n_pad, rows_per_block=8)
    pgh = build_pallas_graph(
        src, dst, n_pad, rows_per_block=8, hub_k=8, hub_k_bwd=8)
    g0 = jax.grad(lambda x_: jnp.sum(
        pallas_spmm_max(pg0, x_, interpret=True).astype(jnp.float32)))(x)
    gh = jax.grad(lambda x_: jnp.sum(
        pallas_spmm_max(pgh, x_, interpret=True).astype(jnp.float32)))(x)
    np.testing.assert_array_equal(
        np.asarray(g0.astype(jnp.float32)), np.asarray(gh.astype(jnp.float32)))


@pytest.mark.parametrize("mix", [False, True])
def test_mix_tails_layouts_agree(mix):
    """The mixed-tail stream packing (round-5: removes the ~1.116x per-row
    G-padding DMA waste) and the legacy padded layout must produce identical
    forward values/argmax routing; backward sums agree to f32
    reduction-order tolerance (the summand SET is identical, only the add
    order within a source row changes)."""
    rng = np.random.default_rng(7)
    src, dst = make_graph(rng, n_real=120, e=1400)
    n_pad, b, f = 128, 2, 512
    pg = build_pallas_graph(src, dst, n_pad, rows_per_block=64,
                            mix_tails=mix)
    # low-entropy values make argmax ties common — the strongest routing test
    x = jnp.asarray(
        rng.integers(0, 4, (n_pad, b, f)).astype(np.float32))
    out = np.asarray(pallas_spmm_max(pg, x, interpret=True))
    xn = np.asarray(x)
    import collections

    adj = collections.defaultdict(list)
    for s_, d_ in zip(src, dst):
        adj[int(d_)].append(int(s_))
    ref = np.zeros_like(xn)
    for d_, ss in adj.items():
        ref[d_] = xn[ss].max(0)
    np.testing.assert_array_equal(out, ref)

    gr = np.asarray(jax.grad(
        lambda xx: jnp.sum(pallas_spmm_max(pg, xx, interpret=True) ** 2)
    )(x))
    egr = np.zeros_like(xn)
    for d_, ss in adj.items():
        ss_sorted = sorted(ss)   # first-maximum = smallest source id on ties
        for bb in range(b):
            for ff in range(f):
                s_best = ss_sorted[int(np.argmax(xn[ss_sorted, bb, ff]))]
                egr[s_best, bb, ff] += 2 * ref[d_, bb, ff]
    np.testing.assert_allclose(gr, egr, atol=1e-4)

    # sum reduce through the same mixed groups
    outs = np.asarray(pallas_spmm_sum(pg, x, interpret=True))
    refs = np.zeros_like(xn)
    for d_, ss in adj.items():
        refs[d_] = xn[ss].sum(0)
    np.testing.assert_allclose(outs, refs, atol=1e-4)


@pytest.mark.parametrize("mix", [False, True])
def test_bf16_bwd_mask16_variant(mix, monkeypatch):
    """The int16 arithmetic-mask hit test must route gradients identically
    to the int32-extended compare (bit-identical selects by construction)."""
    from plagnn_tpu.ops.pallas import spmm_kernels as K

    rng = np.random.default_rng(3)
    src, dst = make_graph(rng, n_real=120, e=1200)
    n_pad, b, f = 128, 4, 512
    pg = build_pallas_graph(src, dst, n_pad, rows_per_block=64,
                            mix_tails=mix)
    x = jnp.asarray(
        rng.integers(0, 4, (n_pad, b, f)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def grad_with(variant):
        monkeypatch.setattr(K, "_BWD16_HIT", variant)
        return np.asarray(jax.grad(
            lambda xx: jnp.sum(
                pallas_spmm_max(pg, xx, interpret=True).astype(jnp.float32)
                ** 2)
        )(x).astype(jnp.float32))

    np.testing.assert_array_equal(grad_with("mask16"), grad_with("cmp32"))


@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_positional_argmax_routing(dt):
    """Positional mode (big-graph scheme: argmax recorded as edge rank
    within the destination row, int16-safe at any node count) must produce
    identical forward values and identical gradient routing to the
    global-id scheme — including under common ties."""
    rng = np.random.default_rng(11)
    src, dst = make_graph(rng, n_real=120, e=1400)
    n_pad, b, f = 128, 2 if dt == jnp.float32 else 4, 512
    pg_id = build_pallas_graph(src, dst, n_pad, rows_per_block=64,
                               positional=False)
    pg_pos = build_pallas_graph(src, dst, n_pad, rows_per_block=64,
                                positional=True)
    assert pg_pos.fwd.pos is not None and pg_pos.bwd.pos is not None
    x = jnp.asarray(
        rng.integers(0, 4, (n_pad, b, f)).astype(np.float32)).astype(dt)

    out_id = np.asarray(
        pallas_spmm_max(pg_id, x, interpret=True).astype(jnp.float32))
    out_pos = np.asarray(
        pallas_spmm_max(pg_pos, x, interpret=True).astype(jnp.float32))
    np.testing.assert_array_equal(out_pos, out_id)

    def grad_of(pg):
        return np.asarray(jax.grad(
            lambda xx: jnp.sum(
                pallas_spmm_max(pg, xx, interpret=True).astype(jnp.float32)
                ** 2)
        )(x).astype(jnp.float32))

    np.testing.assert_array_equal(grad_of(pg_pos), grad_of(pg_id))


def test_positional_beyond_int16_nodes_interpret():
    """Past 2^15 padded nodes the default build is positional and the bf16
    backward stays on the fused-int16 path (no f32 fallback) — verify
    routing vs the scipy-style oracle in interpret mode."""
    rng = np.random.default_rng(5)
    n_pad = (1 << 15) + 128
    n_real = n_pad - 128
    e = 3000
    src = rng.integers(0, n_real, e)
    dst = rng.integers(0, n_real, e)
    pg = build_pallas_graph(src, dst, n_pad, rows_per_block=64)
    assert pg.fwd.pos is not None, "big graphs default to positional"
    b, f = 4, 512
    x = jnp.asarray(
        rng.integers(0, 4, (n_pad, b, f)).astype(np.float32)
    ).astype(jnp.bfloat16)
    gr = np.asarray(jax.grad(
        lambda xx: jnp.sum(
            pallas_spmm_max(pg, xx, interpret=True).astype(jnp.float32) ** 2)
    )(x).astype(jnp.float32))
    xn = np.asarray(x.astype(jnp.float32))
    import collections

    adj = collections.defaultdict(list)
    for s_, d_ in zip(src, dst):
        adj[int(d_)].append(int(s_))
    egr = np.zeros_like(xn)
    for d_, ss in adj.items():
        ss_sorted = sorted(ss)
        mx = xn[ss_sorted].max(0)
        for bb in range(b):
            for ff in range(f):
                s_best = ss_sorted[int(np.argmax(xn[ss_sorted, bb, ff]))]
                egr[s_best, bb, ff] += 2 * mx[bb, ff]
    np.testing.assert_allclose(gr, egr, atol=1e-4)


def test_positional_mega_row_split(monkeypatch):
    """Rows past the positional rank cap are split into virtual sub-rows
    (claimed from unused padding slots) with an XLA post-combine; forward
    values, argmax routing, and sum-VJP must all equal the global-id
    scheme.  The cap is monkeypatched small so a toy graph exercises it."""
    from plagnn_tpu.ops.pallas import spmm_kernels as K

    monkeypatch.setattr(K, "POS_RANK_CAP", 40)
    rng = np.random.default_rng(9)
    src, dst = make_graph(rng, n_real=90, e=1000)
    # force two mega rows with >40 distinct in-neighbors each
    extra_s = np.concatenate([60 + np.arange(51), 40 + np.arange(46)])
    extra_d = np.concatenate([np.full(51, 3), np.full(46, 7)])
    src = np.concatenate([src, extra_s])
    dst = np.concatenate([dst, extra_d])
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    n_pad, b, f = 128, 2, 512
    counts = np.bincount(dst, minlength=n_pad)
    assert (counts > 40).sum() >= 1, "fixture must contain a mega row"

    pg_id = build_pallas_graph(src, dst, n_pad, rows_per_block=64,
                               positional=False)
    pg_pos = build_pallas_graph(src, dst, n_pad, rows_per_block=64,
                                positional=True)
    assert pg_pos.fwd.split is not None
    x = jnp.asarray(rng.integers(0, 4, (n_pad, b, f)).astype(np.float32))

    out_id = np.asarray(pallas_spmm_max(pg_id, x, interpret=True))
    out_pos = np.asarray(pallas_spmm_max(pg_pos, x, interpret=True))
    np.testing.assert_array_equal(out_pos, out_id)

    def grad_of(pg):
        return np.asarray(jax.grad(
            lambda xx: jnp.sum(
                pallas_spmm_max(pg, xx, interpret=True) ** 2))(x))

    np.testing.assert_array_equal(grad_of(pg_pos), grad_of(pg_id))

    # sum reduce + its VJP through the split
    s_id = np.asarray(pallas_spmm_sum(pg_id, x, interpret=True))
    s_pos = np.asarray(pallas_spmm_sum(pg_pos, x, interpret=True))
    np.testing.assert_allclose(s_pos, s_id, atol=1e-4)
    gs_id = np.asarray(jax.grad(lambda xx: jnp.sum(jnp.sin(
        pallas_spmm_sum(pg_id, xx, interpret=True))))(x))
    gs_pos = np.asarray(jax.grad(lambda xx: jnp.sum(jnp.sin(
        pallas_spmm_sum(pg_pos, xx, interpret=True))))(x))
    np.testing.assert_allclose(gs_pos, gs_id, atol=1e-4)


def test_positional_split_rejects_when_no_spare_slots(monkeypatch):
    from plagnn_tpu.ops.pallas import spmm_kernels as K

    monkeypatch.setattr(K, "POS_RANK_CAP", 40)
    # every id 0..126 used, one row with > cap in-edges, dummy=127 reserved
    src = np.arange(126) + 1
    dst = np.zeros(126, np.int64)
    with pytest.raises(ValueError, match="unused node slots"):
        build_pallas_graph(src, dst, 128, rows_per_block=64,
                           positional=True)
