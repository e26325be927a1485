"""Device mesh + sharding plans.

No reference equivalent — the reference is single-process single-GPU
(SURVEY.md §2.10). This is the TPU-native scale-out layer:

  * one global Mesh with axes ("data", "model");
  * embedding tables row-sharded over "model" (large vocabularies live
    partitioned in HBM; XLA turns cross-shard gathers into all-to-all over ICI);
  * everything else replicated; batches sharded over "data";
  * full-sort scoring sharded over the item axis: each shard scores its item
    slice and jax.lax.top_k + the final combine ride an all-gather of only
    (B, k) candidates, not the (B, n_items) score matrix.

The trainer activates this when config["mesh_shape"] is set; the same plan is
exercised on a virtual CPU mesh by __graft_entry__.dryrun_multichip.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# embedding-table param names that get row-sharded over the "model" axis when
# config["shard_item_embeddings"] is on. token_embedding is the unified CTR
# feature vocabulary (2.57M rows at Criteo scale — the flagship row-sharding
# case); its lookups route through parallel/embed.sharded_take_rows.
_SHARDED_TABLE_KEYS = ("item_embedding", "entity_embedding",
                       "user_embedding", "token_embedding")

# process-global active plan: models consult it at trace time to pick the
# explicit shard_map lookup for row-sharded tables (set by the Trainer when
# config["mesh_shape"] is on; None on the single-chip path)
_ACTIVE_PLAN = None


def set_active_plan(plan):
    global _ACTIVE_PLAN
    _ACTIVE_PLAN = plan


def active_plan():
    return _ACTIVE_PLAN


def make_mesh(mesh_shape, devices=None):
    """mesh_shape: dict like {"data": 4, "model": 2}. Missing axes get size 1.

    Multi-process (pod slice / multi-host) layout: the "model" axis is kept
    WITHIN a host's devices so row-sharded-table all-to-alls and the top-k
    all-gather ride ICI; only the "data" axis (gradient all-reduce, the one
    collective that tolerates DCN latency) crosses hosts — the
    scaling-book hybrid-mesh recipe via mesh_utils.create_hybrid_device_mesh.
    """
    explicit = devices is not None
    devices = devices if devices is not None else jax.devices()
    data = int(mesh_shape.get("data", 1))
    model = int(mesh_shape.get("model", 1))
    n = data * model
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    nproc = jax.process_count()
    if (not explicit and nproc > 1 and n == len(devices)
            and data % nproc == 0 and model <= len(jax.local_devices())):
        try:
            from jax.experimental import mesh_utils
            dev_array = mesh_utils.create_hybrid_device_mesh(
                (data // nproc, model), (nproc, 1), devices=devices)
        except ValueError:
            # not a multi-slice TPU topology (e.g. multi-process CPU
            # simulation, or a single pod slice spanning hosts): group by
            # process so the model axis stays within one host's devices
            by_proc = {}
            for d in devices:
                by_proc.setdefault(d.process_index, []).append(d)
            groups = [np.asarray(g).reshape(data // nproc, model)
                      for _, g in sorted(by_proc.items())]
            dev_array = np.concatenate(groups, axis=0)
        return Mesh(dev_array, ("data", "model"))
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


class ShardingPlan:
    """Maps params/batches to NamedShardings for a mesh."""

    def __init__(self, mesh, shard_item_embeddings=False):
        self.mesh = mesh
        self.shard_item_embeddings = shard_item_embeddings

    def replicated(self):
        return NamedSharding(self.mesh, P())

    def shards_table(self, name, leaf):
        """True when param ``name`` is row-sharded under this plan (same
        predicate param_shardings applies by path)."""
        return (self.shard_item_embeddings
                and self.mesh.shape["model"] > 1
                and getattr(leaf, "ndim", 0) == 2
                and any(k in name for k in _SHARDED_TABLE_KEYS)
                and leaf.shape[0] % self.mesh.shape["model"] == 0)

    def batch_spec(self):
        return NamedSharding(self.mesh, P("data"))

    def param_shardings(self, params):
        """Pytree of NamedShardings matching ``params``: 2-D embedding tables
        named in _SHARDED_TABLE_KEYS are row-sharded over "model" (padded rows
        make shards even), everything else replicated."""
        model_size = self.mesh.shape["model"]

        def spec_for(path, leaf):
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            if (self.shard_item_embeddings and model_size > 1
                    and leaf.ndim == 2
                    and any(k in name for k in _SHARDED_TABLE_KEYS)
                    and leaf.shape[0] % model_size == 0):
                return NamedSharding(self.mesh, P("model", None))
            return self.replicated()

        return jax.tree_util.tree_map_with_path(spec_for, params)

    def shard_params(self, params):
        if jax.process_count() == 1:
            return jax.device_put(params, self.param_shardings(params))
        # multi-process: params were initialized identically on every host
        # (same seed); carve each host's addressable shards out of them
        return jax.tree.map(lambda v, s: self._put(np.asarray(v), s),
                            params, self.param_shardings(params))

    def _put(self, v, sharding):
        """device_put that also works multi-process: every process holds the
        full array (each host loads the same dataset files), so
        make_array_from_callback can slice out any addressable shard."""
        if jax.process_count() == 1:
            return jax.device_put(v, sharding)
        return jax.make_array_from_callback(v.shape, sharding,
                                            lambda idx: v[idx])

    def shard_batch(self, batch):
        """Pad the leading dim to a multiple of the data axis and shard it.
        Padding rows are all-zero, which downstream code already treats as
        masked (_weight/_mask columns pad to 0)."""
        data_size = self.mesh.shape["data"]
        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if v.ndim == 0:  # scalars (e.g. _step) replicate
                out[k] = self._put(v, self.replicated())
                continue
            b = v.shape[0]
            rem = (-b) % data_size
            if rem:
                pad_width = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
                v = np.pad(np.asarray(v), pad_width)
            out[k] = self._put(v, self.batch_spec())
        return out


def round_up(x, m):
    return ((x + m - 1) // m) * m
