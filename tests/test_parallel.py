"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4(c)):
edge-partitioned aggregation must match the single-chip result exactly."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from plagnn_tpu.data import synthetic_dataset
from plagnn_tpu.models import gnn32_apply, init_gnn32
from plagnn_tpu.ops import build_graph, from_scipy_coo, pad_features
from plagnn_tpu.parallel import (
    make_mesh,
    make_sharded_forward,
    make_sharded_train_step,
    partition_graph,
    shard_features,
    unshard_rows,
)
from plagnn_tpu.train import weight_cal
from plagnn_tpu.train.kfold import fold_node_masks

N = 140


@pytest.fixture(scope="module")
def bundle():
    ppi, feats, loc, label_list = synthetic_dataset(
        n_nodes=N, n_edges=900, seed=11, feature_dims=(3, 8, 8)
    )
    graph = from_scipy_coo(
        ppi, add_self_loops=True, widths=(4, 16, 64),
        node_multiple=16, edge_multiple=64,
    )
    pg = partition_graph(
        ppi.row, ppi.col, N, n_chips=4, add_self_loops=True, widths=(4, 16, 64)
    )
    return ppi, feats, loc, label_list, graph, pg


def test_partition_preserves_edges(bundle):
    ppi, _, _, _, graph, pg = bundle
    # every chip's local edges, mapped back to global ids, must reproduce the
    # original edge set (incl. self loops)
    p, c, s = pg.n_chips, pg.own_rows, pg.halo_per_peer
    send_idx = np.asarray(pg.send_idx)
    got = set()
    local = pg.local
    for chip in range(p):
        src = np.asarray(local.src[chip])
        dst = np.asarray(local.dst[chip])
        n_pad = local.n_nodes
        dummy = n_pad - 1
        for sl, dl in zip(src, dst):
            if sl == dummy and dl == dummy:
                continue
            d_g = chip * c + dl
            if sl < c:
                s_g = chip * c + sl
            else:
                q, k = divmod(sl - c, s)
                s_g = q * c + send_idx[q, chip, k]
            got.add((int(s_g), int(d_g)))
    expected = set(zip(ppi.row.tolist(), ppi.col.tolist()))
    expected |= {(i, i) for i in range(N)}
    assert got == expected


def test_sharded_forward_matches_single_chip(bundle):
    _, feats, loc, _, graph, pg = bundle
    mesh = make_mesh(n_graph=4, n_fold=1)
    key = jax.random.PRNGKey(3)
    params = init_gnn32(key, feats.shape[1], 13, 9, 7, 5, 12)

    xp = jnp.asarray(pad_features(feats, graph.n_nodes))
    ref = np.asarray(gnn32_apply(params, graph, xp))[:N]

    x_shards = jnp.asarray(shard_features(feats, pg))
    fwd = make_sharded_forward(mesh, pg)
    out = fwd(params, x_shards)
    got = unshard_rows(np.asarray(out), pg)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_train_step_matches_single_chip(bundle):
    _, feats, loc, label_list, graph, pg = bundle
    mesh = make_mesh(n_graph=4, n_fold=2)
    tx = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    w = weight_cal(loc)

    tr_np, _ = fold_node_masks(label_list, pg.n_chips * pg.own_rows, 4, 12)
    tr_np = tr_np[:2]  # two folds
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    params = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        init_gnn32(k1, feats.shape[1], 13, 9, 7, 5, 12),
        init_gnn32(k2, feats.shape[1], 13, 9, 7, 5, 12),
    )
    opt_state = jax.vmap(tx.init)(params)

    # --- single-chip reference (per fold) ---------------------------------
    xp = jnp.asarray(pad_features(feats, graph.n_nodes))
    yp = jnp.asarray(pad_features(loc, graph.n_nodes))
    from plagnn_tpu.train.losses import multi_loss

    def ref_step(p, o, mask_global):
        def loss_fn(pp):
            probs = gnn32_apply(pp, graph, xp)
            return multi_loss(probs, yp, mask_global, jnp.asarray(w, jnp.float32)), probs
        (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), loss, probs

    # masks over the single-chip padded node space
    masks_g = np.zeros((2, graph.n_nodes), bool)
    masks_g[:, :N] = tr_np[:, :N]
    ref_losses, ref_params = [], []
    for b in range(2):
        pb = jax.tree.map(lambda a: a[b], params)
        ob = jax.tree.map(lambda a: a[b], opt_state)
        p2, loss, _ = ref_step(pb, ob, jnp.asarray(masks_g[b]))
        ref_losses.append(float(loss))
        ref_params.append(p2)

    # --- sharded step -----------------------------------------------------
    x_shards = jnp.asarray(shard_features(feats, pg))
    y_shards = jnp.asarray(shard_features(loc, pg))
    tr_masks = jnp.asarray(
        tr_np[:, : pg.n_chips * pg.own_rows].reshape(2, pg.n_chips, pg.own_rows)
    )
    step = make_sharded_train_step(mesh, pg, tx, w)
    p2, o2, losses, probs = step(params, opt_state, x_shards, y_shards, tr_masks)

    np.testing.assert_allclose(np.asarray(losses), ref_losses, rtol=1e-5)
    for b in range(2):
        got = jax.tree.map(lambda a: np.asarray(a[b]), p2)
        exp = jax.tree.map(np.asarray, ref_params[b])
        jax.tree.map(
            lambda g, e: np.testing.assert_allclose(g, e, rtol=1e-4, atol=1e-6),
            got, exp,
        )


@pytest.mark.slow
@pytest.mark.parametrize("overlap,hub", [(True, 0), (False, 0), (True, 4)])
def test_sharded_pallas_step_matches_single_chip(bundle, overlap, hub):
    """The fold-batched Pallas kernels inside the shard_map program (per-chip
    BlockedCsr over the local gather space, halo all_to_all between) must
    reproduce the single-chip XLA training step exactly — the two halves of
    the north star in one program (VERDICT r1 missing #1).  The hub variant
    additionally serves each chip's top-k rows from the stacked VMEM arenas
    (fwd and transpose streams)."""
    from plagnn_tpu.parallel import make_sharded_pallas_train_step

    ppi, feats, loc, label_list, graph, _ = bundle
    pgp = partition_graph(
        ppi.row, ppi.col, N, n_chips=4, add_self_loops=True,
        widths=(4, 16, 64), overlap=overlap, pallas_rows_per_block=8,
        pallas_hub_k=hub, pallas_hub_k_bwd=hub,
    )
    if hub:
        assert pgp.pallas_local.fwd.hub is not None
        assert pgp.pallas_local.bwd.hub is not None
    assert pgp.pallas_local is not None
    assert (pgp.pallas_interior is not None) == overlap
    mesh = make_mesh(n_graph=4, n_fold=2)
    tx = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    w = weight_cal(loc)

    tr_np, _ = fold_node_masks(label_list, pgp.n_chips * pgp.own_rows, 4, 12)
    tr_np = tr_np[:2]
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    params = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        init_gnn32(k1, feats.shape[1], 13, 9, 7, 5, 12),
        init_gnn32(k2, feats.shape[1], 13, 9, 7, 5, 12),
    )
    opt_state = jax.vmap(tx.init)(params)

    # single-chip reference
    xp = jnp.asarray(pad_features(feats, graph.n_nodes))
    yp = jnp.asarray(pad_features(loc, graph.n_nodes))
    from plagnn_tpu.train.losses import multi_loss

    masks_g = np.zeros((2, graph.n_nodes), bool)
    masks_g[:, :N] = tr_np[:, :N]
    ref_losses, ref_params = [], []
    for b in range(2):
        pb = jax.tree.map(lambda a: a[b], params)
        ob = jax.tree.map(lambda a: a[b], opt_state)

        def loss_fn(pp):
            probs = gnn32_apply(pp, graph, xp)
            return multi_loss(probs, yp, jnp.asarray(masks_g[b]),
                              jnp.asarray(w, jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(pb)
        updates, ob = tx.update(grads, ob, pb)
        ref_losses.append(float(loss))
        ref_params.append(optax.apply_updates(pb, updates))

    x_shards = jnp.asarray(shard_features(feats, pgp))
    y_shards = jnp.asarray(shard_features(loc, pgp))
    tr_masks = jnp.asarray(
        tr_np[:, : pgp.n_chips * pgp.own_rows].reshape(
            2, pgp.n_chips, pgp.own_rows)
    )
    step = make_sharded_pallas_train_step(mesh, pgp, tx, w, interpret=True)
    p2, o2, losses, probs = step(params, opt_state, x_shards, y_shards, tr_masks)

    np.testing.assert_allclose(np.asarray(losses), ref_losses, rtol=1e-5)
    for b in range(2):
        got = jax.tree.map(lambda a: np.asarray(a[b]), p2)
        exp = jax.tree.map(np.asarray, ref_params[b])
        jax.tree.map(
            lambda g, e: np.testing.assert_allclose(g, e, rtol=1e-4, atol=1e-6),
            got, exp,
        )


@pytest.mark.slow
def test_sharded_pallas_step_bf16_close(bundle):
    """bf16 messages in the sharded pallas step (halo exchange + edge DMAs
    in bf16) stay within rounding of the f32 sharded step."""
    from plagnn_tpu.parallel import make_sharded_pallas_train_step

    ppi, feats, loc, label_list, graph, _ = bundle
    pgp = partition_graph(
        ppi.row, ppi.col, N, n_chips=4, add_self_loops=True,
        widths=(4, 16, 64), pallas_rows_per_block=8,
    )
    mesh = make_mesh(n_graph=4, n_fold=2)
    tx = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    w = weight_cal(loc)
    tr_np, _ = fold_node_masks(label_list, pgp.n_chips * pgp.own_rows, 4, 12)
    tr_np = tr_np[:2]
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    params = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        init_gnn32(k1, feats.shape[1], 13, 9, 7, 5, 12),
        init_gnn32(k2, feats.shape[1], 13, 9, 7, 5, 12),
    )
    opt_state = jax.vmap(tx.init)(params)
    x_shards = jnp.asarray(shard_features(feats, pgp))
    y_shards = jnp.asarray(shard_features(loc, pgp))
    tr_masks = jnp.asarray(
        tr_np[:, : pgp.n_chips * pgp.own_rows].reshape(
            2, pgp.n_chips, pgp.own_rows)
    )
    step32 = make_sharded_pallas_train_step(mesh, pgp, tx, w, interpret=True)
    step16 = make_sharded_pallas_train_step(
        mesh, pgp, tx, w, agg_dt=jnp.bfloat16, interpret=True)
    _, _, l32, _ = step32(params, opt_state, x_shards, y_shards, tr_masks)
    _, _, l16, _ = step16(params, opt_state, x_shards, y_shards, tr_masks)
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32), rtol=2e-2)


def test_overlap_matches_no_overlap(bundle):
    """Interior/boundary-split (communication-overlapped) aggregation equals
    the monolithic halo path."""
    ppi, feats, loc, _, graph, pg = bundle
    pg_plain = partition_graph(
        ppi.row, ppi.col, N, n_chips=4, add_self_loops=True,
        widths=(4, 16, 64), overlap=False,
    )
    assert pg.interior is not None and pg_plain.interior is None
    mesh = make_mesh(n_graph=4, n_fold=1)
    params = init_gnn32(jax.random.PRNGKey(3), feats.shape[1], 13, 9, 7, 5, 12)
    x_shards = jnp.asarray(shard_features(feats, pg))
    out_a = np.asarray(make_sharded_forward(mesh, pg)(params, x_shards))
    out_b = np.asarray(make_sharded_forward(mesh, pg_plain)(params, x_shards))
    np.testing.assert_allclose(
        unshard_rows(out_a, pg), unshard_rows(out_b, pg_plain),
        rtol=1e-5, atol=1e-6,
    )


def test_sharded_gcn_propagate_matches_single_chip(bundle):
    from plagnn_tpu.ops.spmm import gcn_propagate
    from plagnn_tpu.parallel.sharded import (
        GRAPH_AXIS, sharded_gcn_propagate,
    )
    from jax.sharding import PartitionSpec as P

    ppi, feats, loc, _, graph, pg = bundle
    mesh = make_mesh(n_graph=4, n_fold=1)
    xp = jnp.asarray(pad_features(feats, graph.n_nodes))
    ref = np.asarray(gcn_propagate(graph, xp))[:N]

    def shard_fn(lg, send_idx, x_own, din, dout):
        lg = jax.tree.map(lambda a: a[0], lg)
        out = sharded_gcn_propagate(
            lg, send_idx[0], x_own[0], din[0], dout[0])
        return out[None]

    f = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(GRAPH_AXIS),) * 5, out_specs=P(GRAPH_AXIS),
    )
    x_shards = jnp.asarray(shard_features(feats, pg))
    out = f(pg.local, pg.send_idx, x_shards, pg.in_degree, pg.out_degree)
    np.testing.assert_allclose(unshard_rows(np.asarray(out), pg), ref,
                               rtol=1e-5, atol=1e-6)


def test_balanced_partition_edge_balance_and_roundtrip(bundle):
    """balance=True must (a) bound per-chip edge skew far below the
    contiguous-block skew on a hub-ordered power-law graph, (b) record a
    valid permutation, and (c) round-trip features through
    shard_features/unshard_rows."""
    ppi, feats, _, _, _, _ = bundle
    p = 4
    for bal in (False, True):
        pg = partition_graph(
            ppi.row, ppi.col, N, n_chips=p, add_self_loops=True,
            widths=(4, 16, 64), balance=bal,
        )
        # per-chip real edge counts from the local graphs (dummy edges
        # excluded: both endpoints == n_pad-1)
        counts = []
        for chip in range(p):
            src = np.asarray(pg.local.src[chip])
            dst = np.asarray(pg.local.dst[chip])
            dummy = pg.local.n_nodes - 1
            counts.append(int(np.sum(~((src == dummy) & (dst == dummy)))))
        if bal:
            row_map = np.asarray(pg.row_map)
            node_row = np.asarray(pg.node_row)
            assert np.sum(row_map >= 0) == N
            assert np.array_equal(row_map[node_row], np.arange(N))
            x = shard_features(feats, pg)
            np.testing.assert_array_equal(unshard_rows(x, pg), feats)
            bal_skew = max(counts) / (sum(counts) / p)
            assert bal_skew <= contig_skew + 1e-9
            assert bal_skew < 1.35, counts
        else:
            assert pg.row_map is None
            contig_skew = max(counts) / (sum(counts) / p)
    # powerlaw_ppi puts hubs at low ids: contiguous blocks are heavily skewed
    assert contig_skew > 1.5, contig_skew


def test_balanced_sharded_forward_matches_single_chip(bundle):
    """The full sharded forward over a BALANCED partition must equal the
    single-chip forward after unshard_rows undoes the permutation."""
    ppi, feats, loc, _, graph, _ = bundle
    pgb = partition_graph(
        ppi.row, ppi.col, N, n_chips=4, add_self_loops=True,
        widths=(4, 16, 64), balance=True,
    )
    mesh = make_mesh(n_graph=4, n_fold=1)
    params = init_gnn32(jax.random.PRNGKey(3), feats.shape[1], 13, 9, 7, 5, 12)
    xp = jnp.asarray(pad_features(feats, graph.n_nodes))
    ref = np.asarray(gnn32_apply(params, graph, xp))[:N]
    x_shards = jnp.asarray(shard_features(feats, pgb))
    out = make_sharded_forward(mesh, pgb)(params, x_shards)
    got = unshard_rows(np.asarray(out), pgb)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
