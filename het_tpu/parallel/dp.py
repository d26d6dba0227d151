"""shard_map data-parallel execution over a partitioned heterograph.

The collective structure per layer (new relative to the single-GPU
reference; the design SURVEY.md §7 calls for):

    x_local (per, F)  --all_gather('dp')-->  x_global (P*per, F)
    layer(g_local, x_global, x_dst=x_local)  -> h_local (per, out)

Aggregations stay shard-local (edges live with their destinations), the
all-gather is the halo exchange, and parameter gradients pick up their psum
from the shard_map transpose of the replicated in_spec.  XLA's latency
hiding overlaps the gather with the local typed matmuls.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.structures import HeteroGraph
from .partition import PartitionInfo, unstack_local

Array = jax.Array


def make_mesh(n_devices: int = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert len(devs) >= n_devices, (
        f"need {n_devices} devices, have {len(devs)} "
        "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for tests)"
    )
    import numpy as np

    return Mesh(np.array(devs[:n_devices]), (axis,))


def make_mesh2(
    n_hosts: int, chips_per_host: int, axes=("host", "chip")
) -> Mesh:
    """Two-level ``(host, chip)`` mesh — the multi-host slice layout
    (BASELINE.json north star): the minor ``chip`` axis maps to ICI
    within a host, the major ``host`` axis to DCN between hosts.  Shard
    p of a partitioned graph lives at (p // C, p % C), so contiguous
    dst-ranges — which share the most boundary with their neighbors —
    stay on the SAME host (DCN-aware placement falls out of the
    locality-preserving flat order).  Every collective in this module
    accepts the axis pair (``axis=('host', 'chip')``): jax flattens the
    tuple host-major, matching the partition index, and XLA routes the
    intra-host sub-exchange over ICI and only the cross-host blocks over
    DCN."""
    devs = jax.devices()
    n = n_hosts * chips_per_host
    assert len(devs) >= n, (
        f"need {n} devices, have {len(devs)} "
        "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for tests)"
    )
    import numpy as np

    return Mesh(
        np.array(devs[:n]).reshape(n_hosts, chips_per_host), tuple(axes)
    )


def shard_stacked(tree, mesh: Mesh, axis: str = "dp"):
    """Place a stacked (leading device axis) pytree onto the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def halo_gather(h_local: Array, axis: str = "dp") -> Array:
    """All-gather shard-local node rows into the padded-global space —
    the simple (fallback) boundary-feature exchange over ICI."""
    return jax.lax.all_gather(h_local, axis, axis=0, tiled=True)


def halo_exchange(
    h_local: Array, g_local: HeteroGraph, axis: str = "dp"
) -> Array:
    """Boundary-only source-feature exchange (north star: BASELINE.json).

    Each shard gathers the rows every peer needs (``g.halo_send_idx``, one
    B_off block per peer, precomputed host-side by
    partition_by_dst(halo='boundary')), all_to_all's the blocks over ICI,
    and assembles the compact source buffer ``[own | recv_0 | ... |
    recv_{P-1}]`` that its edges' ``g.src`` index.  Per-device ICI traffic
    is (P-1) * B_off * F rows instead of the all-gather's (P-1) * per * F;
    XLA overlaps the collective with the local projections exactly as it
    does the all-gather.  The transpose (grad) is the reverse all_to_all +
    a node-scale scatter-add into local rows — inserted automatically by
    the shard_map transpose of this function."""
    si, ki = g_local.halo_self_idx, g_local.halo_send_idx
    assert ki is not None, "graph partitioned without halo='boundary'"
    tail = h_local.shape[1:]
    P, B = ki.shape
    own = jnp.take(h_local, si, axis=0)  # (B_self, ...)
    send = jnp.take(h_local, ki.reshape(-1), axis=0).reshape((P, B) + tail)
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    return jnp.concatenate(
        [own, recv.reshape((P * B,) + tail)], axis=0
    )


def halo_bytes(g_local: HeteroGraph, n_parts: int, feat_width: int,
               itemsize: int = 4, chips_per_host: int = 0) -> dict:
    """Per-device bytes a layer's source exchange moves, for the boundary
    all_to_all vs the all-gather fallback (dryrun reporting).

    ``chips_per_host`` > 0 additionally splits the boundary traffic by
    LINK CLASS under the two-level ``(host, chip)`` mesh (make_mesh2):
    blocks exchanged with same-host peers ride ICI, the rest cross DCN —
    the quantity a DCN-aware partitioning has to minimize."""
    gather = (n_parts - 1) * g_local.num_nodes * feat_width * itemsize
    if g_local.halo_send_idx is None:
        out = {"mode": "gather", "ici_bytes": gather,
               "gather_bytes": gather}
        if chips_per_host:
            c = chips_per_host
            out["ici_bytes"] = (
                (c - 1) * g_local.num_nodes * feat_width * itemsize
            )
            out["dcn_bytes"] = gather - out["ici_bytes"]
        return out
    b_off = int(g_local.halo_send_idx.shape[-1])
    row = b_off * feat_width * itemsize
    out = {
        "mode": "boundary",
        "ici_bytes": (n_parts - 1) * row,
        "gather_bytes": gather,
    }
    if chips_per_host:
        c = chips_per_host
        out["ici_bytes"] = (c - 1) * row
        out["dcn_bytes"] = (n_parts - c) * row
    return out


def dp_apply(
    apply_fn: Callable,
    params,
    sg: HeteroGraph,
    x: Array,
    mesh: Mesh,
    *,
    axis: str = "dp",
    check_vma: Optional[bool] = None,
):
    """Run ``apply_fn(params, g_local, x_local)`` on every shard.

    ``apply_fn`` may call :func:`halo_gather` internally (any number of
    times — once per layer).  ``sg`` is the stacked partitioned graph; ``x``
    is (num_padded_global_nodes, F), sharded by rows; the result is the
    row-sharded per-shard outputs reassembled as
    (num_padded_global_nodes, out)."""

    def local_fn(params, g_stack, x_loc):
        g_local = unstack_local(g_stack)
        return apply_fn(params, g_local, x_loc)

    if check_vma is None:
        # vma-clean by default: replicated weights entering custom_vjp
        # boundaries are explicitly pcast-to-varying at the op wrappers
        # (ops/common.py match_vma), so the pcast's transpose — the psum
        # the static replication checker needs to see — lands outside the
        # opaque custom_vjp and the shard_map TRANSPOSE type-checks; pallas
        # out_shapes carry operand vma (ops/common.py out_struct).  The one
        # combination that cannot type-check is pallas INTERPRET mode (CPU
        # test meshes): the hlo interpreter replays kernel jaxprs under the
        # vma checker, where even `ref * const` mixes varying and invariant
        # operands — a pallas-interpret limitation, not an op-layer one.
        from ..ops import get_backend

        check_vma = not (
            get_backend() == "pallas" and jax.default_backend() != "tpu"
        )
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=check_vma,
    )(params, sg, x)


class DPGNN:
    """Distributed multi-layer GNN driver: a stack of single-shard flax
    layers with halo all-gather between layers.

    Works with any layer whose ``__call__(g, x, x_dst=..)`` distinguishes
    source-space and destination-space features (RGATLayer, RGCNLayer)."""

    def __init__(self, layers: Sequence, mesh: Mesh, axis: str = "dp"):
        self.layers = list(layers)
        self.mesh = mesh
        self.axis = axis

    @staticmethod
    def _is_halo_style(layer) -> bool:
        """Layers that take local features + an internal halo hook (HGT)
        vs gathered-x + x_dst style (RGAT/RGCN/GAT)."""
        from ..models.hgt import HGTLayer

        return isinstance(layer, HGTLayer)

    def init(self, key, sg: HeteroGraph, x: Array) -> List:
        """Initialize per-layer params by running shard 0 single-device."""
        g_local = jax.tree.map(lambda a: a[0], sg)
        n_parts = jax.tree.leaves(sg)[0].shape[0]
        params = []
        h = jnp.asarray(x)
        h_loc = h[: g_local.num_nodes]
        boundary = g_local.halo_send_idx is not None

        def tile_halo(t):
            # shape-only stand-in for the cross-shard exchange (init cares
            # about shapes; layer-1+ init values are approximate anyway)
            if boundary:
                P, B = g_local.halo_send_idx.shape
                own = jnp.take(t, g_local.halo_self_idx, axis=0)
                return jnp.concatenate(
                    [own, jnp.zeros((P * B,) + t.shape[1:], t.dtype)], 0
                )
            return jnp.tile(t, (n_parts,) + (1,) * (t.ndim - 1))

        def emu_exchange(h_glob):
            """Exact single-device emulation of halo_exchange for shard 0
            given the full padded-global feature array.

            Assumes the partitioner's block relabeling: shard p's local
            node i sits at padded-global row ``p * nodes_per_part + i``
            (partition.relabel).  Asserted so a future relabeling change
            (e.g. degree sort) breaks loudly here instead of silently
            desyncing init from the real halo_exchange (ADVICE r4)."""
            per = g_local.num_nodes
            assert h_glob.shape[0] == n_parts * per, (
                "emu_exchange expects block relabeling "
                f"(rows={h_glob.shape[0]}, parts x nodes={n_parts}x{per})"
            )
            own = jnp.take(h_glob, g_local.halo_self_idx, axis=0)
            blocks = [
                jnp.take(
                    h_glob,
                    p * per + jnp.asarray(sg.halo_send_idx[p, 0]),
                    axis=0,
                )
                for p in range(n_parts)
            ]
            return jnp.concatenate([own] + blocks, axis=0)

        for layer in self.layers:
            key, k = jax.random.split(key)
            if self._is_halo_style(layer):
                p = layer.init(k, g_local, h_loc, halo=tile_halo)
                params.append(p)
                h_loc = layer.apply(p, g_local, h_loc, halo=tile_halo)
            else:
                h_src = emu_exchange(h) if boundary else h
                p = layer.init(k, g_local, h_src, x_dst=h_loc)
                params.append(p)
                h_loc = layer.apply(p, g_local, h_src, x_dst=h_loc)
            h = jnp.tile(h_loc, (n_parts, 1))
        return params

    def apply(self, params: List, sg: HeteroGraph, x: Array) -> Array:
        axis = self.axis
        layers = self.layers

        halo_style = [self._is_halo_style(l) for l in layers]

        def fwd(params, g_local, x_loc):
            if g_local.halo_send_idx is not None:
                exchange = lambda t: halo_exchange(t, g_local, axis)  # noqa: E731
            else:
                exchange = lambda t: halo_gather(t, axis)  # noqa: E731
            h = x_loc
            for layer, p, hs in zip(layers, params, halo_style):
                if hs:
                    # HGT: per-node projections happen locally; only the
                    # projected k/v cross shards (smaller halo than raw x)
                    h = layer.apply(p, g_local, h, halo=exchange)
                else:
                    h = layer.apply(p, g_local, exchange(h), x_dst=h)
            return h

        return dp_apply(fwd, params, sg, x, self.mesh, axis=axis)
