"""Graph-node sampling for the condgraph middle head.

Parity target: reference ``fcos_core/modeling/rpn/fcos/loss.py:239-527``
(``PrototypeComputation``):

* source mode: FCOS point labelling over the middle-head features (same
  size-of-interest binning as the FCOS loss), all positive points become
  nodes, plus the same number of background points picked evenly along the
  flattened negative sequence (``loss.py:437-458``);
* target mode: candidate points from the class activation maps
  (score_threshold / dbscan variants, ``loss.py:479-518``), pseudo-labels
  from the argmax over foreground channels, and the same balanced
  background sampling.

TPU-native design: node sets get a fixed capacity (``max_nodes``) with a
validity mask; "all positives + equally many negatives" becomes priority
selection with a stable sort. The reference's sklearn-on-CPU DBSCAN
(``loss.py:397-423``) is replaced by an on-device fixed-iteration density
clustering over a capped candidate set (see ``density_cluster_drop_first``)
— the host round-trip that dominated the reference's target pass is gone.
"""

from typing import Sequence

import jax
import jax.numpy as jnp

from ..fcos.targets import compute_targets, expand_soi


def _even_subset_mask(select_from: jnp.ndarray, want: jnp.ndarray) -> jnp.ndarray:
    """Exact membership set of the reference's balanced-BG selection
    ``np.floor(np.linspace(0, n-2, want))`` (loss.py:455, 517) over the True
    entries of ``select_from``, ranked in flat order.

    The r-th True element is selected iff some i in [0, want) has
    floor(i*(n-2)/(want-1)) == r, i.e. the smallest i with
    i*(n-2)/(want-1) >= r still lands below r+1. Duplicated linspace
    indices (want approaching n) collapse to a single selection here —
    the reference would emit the same node twice (see PARITY.md).
    """
    n = jnp.sum(select_from.astype(jnp.int32))
    rank = jnp.cumsum(select_from.astype(jnp.int32)) - 1  # rank among True
    want_i = want.astype(jnp.int32)
    m = jnp.maximum(n - 2, 1)
    km1 = jnp.maximum(want_i - 1, 1)
    # integer membership: rank r is floor(i*m/km1) for some i in [0, km1]
    # iff ceil(r*km1/m) <= floor(((r+1)*km1 - 1)/m). Integer arithmetic —
    # XLA's reciprocal-multiply float division is not exact at the
    # boundaries np.linspace lands on.
    r = jnp.maximum(rank, 0)
    lo = (r * km1 + m - 1) // m
    hi = ((r + 1) * km1 - 1) // m
    hit = (lo <= hi) & (lo <= km1)
    # degenerate spans: n <= 2 or want == 1 -> reference selects index 0
    hit = jnp.where((n > 2) & (want_i >= 2), hit, rank == 0)
    # reference takes ALL negatives when positives outnumber them
    # (loss.py:452-454)
    hit = jnp.where(want_i >= n, jnp.ones_like(hit), hit)
    hit = jnp.where(want_i >= 1, hit, jnp.zeros_like(hit))
    return select_from & hit & (rank >= 0)


def gather_nodes(features_flat: jnp.ndarray, labels_flat: jnp.ndarray,
                 select: jnp.ndarray, max_nodes: int):
    """Gather selected rows into a fixed (max_nodes, C) buffer.

    Returns (nodes, node_labels, node_valid). Node order reproduces the
    reference's ``cat([neg_points, pos_points])`` layout (loss.py:462-466):
    all selected background rows first, then all selected foreground rows,
    each group in flat (level-major) order. The order is semantic, not
    cosmetic: the reference MHA's raw-view head split makes graph
    aggregation depend on node positions. Overflow truncates positives
    first (background keeps the balance anchor).
    """
    n = select.shape[0]
    is_pos = labels_flat > 0
    pos_idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(
        select,
        is_pos.astype(jnp.int32) * n + pos_idx,
        2 * n + pos_idx,
    )
    order = jnp.argsort(key)
    idx = order[:max_nodes]
    nodes = features_flat[idx]
    node_labels = labels_flat[idx]
    node_valid = select[idx]
    nodes = nodes * node_valid[:, None].astype(nodes.dtype)
    node_labels = jnp.where(node_valid, node_labels, 0)
    return nodes, node_labels, node_valid


def sample_source_nodes(
    locations: Sequence[jnp.ndarray],
    features: Sequence[jnp.ndarray],  # NHWC middle-head features per level
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    max_nodes: int,
    with_bg: bool = True,
):
    """Returns (nodes, node_labels, node_valid, act_labels_per_level).

    act_labels_per_level: the full per-location labels used by the
    activation-map loss (reference returns them as the third output,
    loss.py:460-461).
    """
    num_points = [loc.shape[0] for loc in locations]
    locs_all = jnp.concatenate(locations, axis=0)
    soi = expand_soi(num_points)
    labels, _ = compute_targets(locs_all, soi, gt_boxes, gt_labels, gt_mask)
    # labels: (B, L_total). Split back per level for the act loss.
    act_labels = []
    start = 0
    for n in num_points:
        act_labels.append(labels[:, start : start + n])
        start += n

    # Per-level balanced fg/bg selection over the (B*HW,) flattened axis.
    selects = []
    feats_flat = []
    labels_flat_all = []
    for lvl, (f, lab) in enumerate(zip(features, act_labels)):
        c = f.shape[-1]
        ff = f.reshape(-1, c)
        ll = lab.reshape(-1)
        pos = ll > 0
        n_pos = jnp.sum(pos.astype(jnp.int32))
        if with_bg:
            neg = _even_subset_mask(~pos, n_pos)
            sel = pos | neg
        else:
            sel = pos
        selects.append(sel)
        feats_flat.append(ff)
        labels_flat_all.append(ll)

    features_cat = jnp.concatenate(feats_flat, axis=0)
    labels_cat = jnp.concatenate(labels_flat_all, axis=0)
    select_cat = jnp.concatenate(selects, axis=0)
    nodes, node_labels, node_valid = gather_nodes(
        features_cat, labels_cat, select_cat, max_nodes
    )
    return nodes, node_labels, node_valid, act_labels


def density_cluster_drop_first(
    points: jnp.ndarray,  # (K, C) candidate features (zero rows for invalid)
    valid: jnp.ndarray,  # (K,)
    eps: float,
    min_samples: int = 5,
    num_prop_iters: int = 16,
):
    """On-device DBSCAN-flavoured filter reproducing the reference's usage.

    The reference (loss.py:414-418) runs sklearn DBSCAN over the candidate
    features and then KEEPS noise points (label -1 -> 1) and every cluster
    except cluster 0 — i.e. it throws away the cluster discovered first
    (in flat scan order), treating the dominant/first density blob as
    uninformative. We reproduce that: connected components over the
    eps-graph restricted to core points, component id = min member index,
    the component containing the lowest-indexed core point is dropped.

    Returns keep mask (K,).
    """
    k = points.shape[0]
    sq = jnp.sum(points * points, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (points @ points.T)
    adj = (d2 <= eps * eps) & valid[:, None] & valid[None, :]

    degree = jnp.sum(adj.astype(jnp.int32), axis=1)  # includes self
    core = valid & (degree >= min_samples)

    # Border points attach to core components; core-core edges merge.
    prop_adj = adj & core[None, :]  # can receive labels only from cores
    comp = jnp.where(valid, jnp.arange(k), k)

    def body(_, comp):
        # min over core neighbours' component ids
        neigh = jnp.where(prop_adj, comp[None, :], k)
        best = jnp.min(neigh, axis=1)
        new = jnp.minimum(comp, best)
        # only core points forward labels transitively; border points take
        # labels but don't merge components through themselves
        return jnp.where(valid, jnp.where(core, new, jnp.minimum(comp, best)), k)

    comp = jax.lax.fori_loop(0, num_prop_iters, body, comp)

    any_core = jnp.any(core)
    first_core_comp = jnp.min(jnp.where(core, comp, k))
    noise = valid & ~core & ~jnp.any(adj & core[None, :], axis=1)
    in_first = (comp == first_core_comp) & ~noise
    keep = valid & (noise | ~in_first)
    # With no core points at all everything is noise -> all kept.
    return jnp.where(any_core, keep, valid)


def kmeans2_minority(points, valid, iters: int = 8):
    """Fixed-iteration 2-means over candidate features; keep the minority
    cluster. Parity target: reference ``KMEANS_batch_ClS_FEAT``
    (loss.py:361-393): sklearn k-means(2) over act-weighted features with a
    size-order flip so the kept cluster (label 1) is the smaller one.
    """
    k0 = points[jnp.argmax(valid)]  # first valid point
    norms = jnp.where(valid, jnp.sum(points * points, axis=1), -1.0)
    k1 = points[jnp.argmax(norms)]  # farthest-energy point as 2nd seed

    def step(_, centers):
        c0, c1 = centers
        d0 = jnp.sum((points - c0) ** 2, axis=1)
        d1 = jnp.sum((points - c1) ** 2, axis=1)
        assign = (d1 < d0) & valid
        w1 = assign.astype(points.dtype)
        w0 = (valid & ~assign).astype(points.dtype)
        new_c0 = (w0 @ points) / jnp.maximum(jnp.sum(w0), 1.0)
        new_c1 = (w1 @ points) / jnp.maximum(jnp.sum(w1), 1.0)
        return (new_c0, new_c1)

    c0, c1 = jax.lax.fori_loop(0, iters, step, (k0, k1))
    d0 = jnp.sum((points - c0) ** 2, axis=1)
    d1 = jnp.sum((points - c1) ** 2, axis=1)
    in1 = (d1 < d0) & valid
    n1 = jnp.sum(in1.astype(jnp.int32))
    n0 = jnp.sum((valid & ~in1).astype(jnp.int32))
    # keep the minority cluster (reference flips when sizes are inverted)
    keep = jnp.where(n1 <= n0, in1, valid & ~in1)
    return keep


def meanshift_high_mode(scores, valid, bandwidth: float = 0.1,
                        iters: int = 10):
    """Fixed-iteration 1-D mean shift over activation scores; keep points
    whose converged mode exceeds the overall valid mean. Approximates the
    reference's MeanShift_GPU-based sampling (loss.py:482-488,
    layers/mean_shift.py:26-101) on device."""
    x = jnp.where(valid, scores, 0.0)

    def step(_, y):
        diff = y[:, None] - x[None, :]
        w = jnp.exp(-0.5 * (diff / bandwidth) ** 2) * valid[None, :]
        return (w @ x) / jnp.maximum(jnp.sum(w, axis=1), 1e-8)

    modes = jax.lax.fori_loop(0, iters, step, x)
    mean_all = jnp.sum(x) / jnp.maximum(jnp.sum(valid), 1.0)
    return valid & (modes > mean_all)


def sample_target_nodes(
    features: Sequence[jnp.ndarray],  # NHWC per level
    act_maps: Sequence[jnp.ndarray],  # (B, H, W, C_used) probabilities
    max_nodes: int,
    sampling_cfg: str = "dbscan",
    score_threshold: float = 0.5,
    dbscan_eps: float = 3.0,
    dbscan_thr: float = 0.05,
    max_candidates_per_level: int = 512,
):
    """Target-domain node sampling from activation maps.

    Returns (nodes, node_labels, node_valid, any_nodes). node_labels are
    pseudo-labels: argmax over foreground channels + 1; background samples
    get 0 (reference loss.py:497-514).
    """
    selects, feats_flat, plabels_flat = [], [], []
    for f, act in zip(features, act_maps):
        c = f.shape[-1]
        n_cls = act.shape[-1]
        ff = f.reshape(-1, c)
        aa = act.reshape(-1, n_cls)
        fg = aa[:, 1:]

        if sampling_cfg == "score_threshold":
            conf_pos = jnp.any(fg > score_threshold, axis=-1)
        elif sampling_cfg == "kmeans":
            # act>0.5 candidates, 2-means over act-weighted features, keep
            # the minority cluster (reference loss.py:361-393,490-491).
            n_loc = ff.shape[0]
            cand_score = fg.T.reshape(-1)
            cand_mask = cand_score > 0.5
            k = min(max_candidates_per_level, cand_score.shape[0])
            top_scores, top_idx = jax.lax.top_k(
                jnp.where(cand_mask, cand_score, -1.0), k
            )
            cand_valid = top_scores > 0
            loc_idx = top_idx % n_loc
            pts = ff[loc_idx] * top_scores[:, None] * cand_valid[:, None]
            keep = kmeans2_minority(pts, cand_valid)
            conf_pos = (
                jnp.zeros((n_loc,), jnp.int32)
                .at[loc_idx]
                .add(keep.astype(jnp.int32))
                > 0
            )
        elif sampling_cfg == "mean_shift":
            # per-class 1-D mean shift over activation scores
            # (reference loss.py:482-488), capped per level.
            n_loc = ff.shape[0]
            cand_score = fg.T.reshape(-1)
            k = min(max_candidates_per_level * 2, cand_score.shape[0])
            top_scores, top_idx = jax.lax.top_k(cand_score, k)
            cand_valid = top_scores > 1e-4
            keep = meanshift_high_mode(top_scores, cand_valid)
            loc_idx = top_idx % n_loc
            conf_pos = (
                jnp.zeros((n_loc,), jnp.int32)
                .at[loc_idx]
                .add(keep.astype(jnp.int32))
                > 0
            )
        elif sampling_cfg == "dbscan":
            # Candidate (location, class) pairs above the threshold; each
            # carries feature * act weight (reference loss.py:404-414).
            n_loc = ff.shape[0]
            cand_score = fg.T.reshape(-1)  # class-major like the reference
            cand_mask = cand_score > dbscan_thr
            k = min(max_candidates_per_level, cand_score.shape[0])
            top_scores, top_idx = jax.lax.top_k(
                jnp.where(cand_mask, cand_score, -1.0), k
            )
            cand_valid = top_scores > 0
            loc_idx = top_idx % n_loc
            pts = ff[loc_idx] * top_scores[:, None]
            pts = pts * cand_valid[:, None]
            keep = density_cluster_drop_first(pts, cand_valid, dbscan_eps)
            conf_pos = (
                jnp.zeros((n_loc,), jnp.int32)
                .at[loc_idx]
                .add(keep.astype(jnp.int32))
                > 0
            )
        else:
            raise KeyError(f"unsupported TARGET_SAMPLING_CFG: {sampling_cfg}")

        n_pos = jnp.sum(conf_pos.astype(jnp.int32))
        neg = _even_subset_mask(~conf_pos, n_pos)
        selects.append(conf_pos | neg)
        feats_flat.append(ff)
        plabels_flat.append(
            jnp.where(conf_pos, jnp.argmax(fg, axis=-1).astype(jnp.int32) + 1, 0)
        )

    features_cat = jnp.concatenate(feats_flat, axis=0)
    labels_cat = jnp.concatenate(plabels_flat, axis=0)
    select_cat = jnp.concatenate(selects, axis=0)
    nodes, node_labels, node_valid = gather_nodes(
        features_cat, labels_cat, select_cat, max_nodes
    )
    any_nodes = jnp.any(node_valid)
    return nodes, node_labels, node_valid, any_nodes
