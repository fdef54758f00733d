"""JAX training/prediction loops for the IST encoder.

Replaces the reference's Lightning module + Trainer
(reference: src/segger/models/lightning_model.py:19-303,
src/segger/cli/segment.py:390-413) with a plain functional loop:
optax Adam, cosine loss-weight schedule, jitted train/predict steps
vmapped over stacked tiles, and SPMD data parallelism over a device mesh
(the batch axis is sharded; gradients are averaged by XLA collectives
inserted for the sharded computation).
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.graph import TileGraph
from ..data.assemble import HostGraph
from ..data.partition import (
    TileSpec,
    tile_bucket,
    merge_buckets,
    extract_tile,
    stack_tiles,
    empty_tile,
    first_fit_decreasing_bucketed,
    best_fit_decreasing,
)
from ..models.encoder import ISTEncoder
from ..models import losses as L
from ..ops import csr_gather, csr_max

logger = logging.getLogger(__name__)


@dataclass
class TrainConfig:
    """Hyperparameters (defaults follow LitISTEncoder/ISTDataModule,
    reference: lightning_model.py:27-48, cli/segment.py:201-205)."""

    in_channels: int = 16
    hidden_channels: int = 64
    out_channels: int = 64
    n_mid_layers: int = 2
    n_heads: int = 2
    learning_rate: float = 1e-3
    sg_loss_type: str = "triplet"
    tx_margin: float = 0.3
    sg_margin: float = 0.4
    tx_weight_start: float = 1.0
    tx_weight_end: float = 1.0
    bd_weight_start: float = 1.0
    bd_weight_end: float = 1.0
    sg_weight_start: float = 0.0
    sg_weight_end: float = 0.5
    update_gene_embedding: bool = True
    use_positional_embeddings: bool = True
    normalize_embeddings: bool = True
    compute_dtype: str = "bfloat16"  # default after the r2 accuracy
                                     # soak (examples/xenium_scale.py
                                     # --dtype {float32,bfloat16}: F1
                                     # 0.9796 both, accuracy 0.9032
                                     # both, 100k tx on v5e); cuts
                                     # edge-stage HBM traffic ~2x.
                                     # Params/optimizer state and
                                     # softmax statistics stay float32;
                                     # set 'float32' to opt out.
    max_epochs: int = 20
    edges_per_batch: int = 1_000_000
    training_fraction: float = 0.75
    tiles_per_step: int = 1
    seed: int = 0
    # mid-training checkpointing (the reference has none — SURVEY §5.4;
    # runs are short, but whole-slide jobs warrant resume)
    checkpoint_every: int = 0          # epochs; 0 = end only via caller
    checkpoint_dir: Optional[str] = None
    # run up to this many optimizer steps inside one jitted lax.scan
    # (amortizes per-call dispatch latency; batches must share shapes,
    # which the bucketed packer provides). 0 = one dispatch per step.
    scan_steps: int = 0
    # 'global' pads every batch of a fit/predict pass to ONE merged
    # bucket shape so the whole pass compiles a single program per scan
    # depth; 'bin' keeps per-bin merged shapes (less padding, one
    # compile per distinct bin shape).  At whole-slide scale XLA
    # compilation dominates wall-clock (measured 1.4 ks of a 1.5 ks
    # 1M-transcript fit), so 'global' is the default; padding overhead
    # is bounded by the bucket rounding (~10-30% extra edge-stage work).
    shape_merge: str = "global"
    # Cache per-tile extraction results across epochs, up to this many
    # GB of host RAM (0 disables).  With 'global' shape merge the
    # padded extraction of a tile is identical every epoch — only the
    # shuffled grouping into batches changes — so epochs >= 2 skip the
    # fancy-indexing/CSR-build host work entirely and just restack.
    # (The reference re-slices tiles in DataLoader workers each epoch,
    # data_module.py:346-366.)
    tile_cache_gb: float = 24.0


class SeggerTrainer:
    """Train + predict driver over a HostGraph and tile specs."""

    def __init__(
        self,
        graph: HostGraph,
        config: Optional[TrainConfig] = None,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis —
        stacked-tile batches are sharded over it (tile data parallelism;
        XLA inserts the gradient all-reduce)."""
        import dataclasses

        from ..utils import enable_compilation_cache

        enable_compilation_cache()
        self.graph = graph
        config = TrainConfig() if config is None else config
        if mesh is not None and config.tiles_per_step % mesh.size:
            # never mutate the caller's config object in place
            config = dataclasses.replace(
                config,
                tiles_per_step=mesh.size * max(
                    1, config.tiles_per_step // mesh.size
                ),
            )
        self.cfg = config
        self.mesh = mesh
        # gene embedding provides in_channels when pretrained
        # (lightning_model.py:94-106)
        emb = graph.gene_embedding
        self.in_channels = emb.shape[1]
        self.model = ISTEncoder(
            n_genes=graph.n_genes,
            in_channels=self.in_channels,
            hidden_channels=config.hidden_channels,
            out_channels=config.out_channels,
            n_mid_layers=config.n_mid_layers,
            n_heads=config.n_heads,
            normalize_embeddings=config.normalize_embeddings,
            use_positional_embeddings=config.use_positional_embeddings,
            dtype=(
                jnp.bfloat16
                if config.compute_dtype == "bfloat16"
                else None
            ),
        )
        self.tx_similarity = jnp.asarray(graph.tx_similarity)
        self.bd_similarity = jnp.asarray(graph.bd_similarity)
        self.params = None
        self.opt_state = None
        self.tx = optax.adam(config.learning_rate)
        self._train_step = None
        self._predict_step = None
        self.history: List[Dict] = []
        # epoch-spanning tile-extraction cache (TrainConfig.tile_cache_gb)
        self._tile_cache: Dict = {}
        self._tile_cache_bytes = 0
        # host<->device transfer byte counters: on this environment's
        # tunneled TPU backend every transfer leaks host anon memory
        # ~1:1 with bytes moved (tools/tunnel_leak_probe.py), so run
        # artifacts separate framework residency from tunnel staging
        self.bytes_to_device = 0
        self.bytes_to_host = 0

    # ------------------------------------------------------------------
    def init(self, template: TileGraph):
        rng = jax.random.PRNGKey(self.cfg.seed)
        params = self.model.init(rng, jax.tree.map(jnp.asarray, template))
        # install the pretrained gene embedding
        # (Embedding.from_pretrained, lightning_model.py:103-106)
        params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        p = dict(params["params"])
        p["gene_embedding"] = {
            "embedding": jnp.asarray(self.graph.gene_embedding)
        }
        params = {"params": p}
        self.params = params
        if self.cfg.update_gene_embedding:
            self.opt_state = self.tx.init(params)
        else:
            # freeze the gene embedding by masking its updates
            self.tx = optax.masked(
                optax.adam(self.cfg.learning_rate),
                jax.tree_util.tree_map_with_path(
                    lambda path, _: "gene_embedding"
                    not in str(jax.tree_util.keystr(path)),
                    params,
                ),
            )
            self.opt_state = self.tx.init(params)
        return params

    # ------------------------------------------------------------------
    def _count_to_device(self, tree):
        self.bytes_to_device += sum(
            a.nbytes for a in jax.tree.leaves(tree)
            if hasattr(a, "nbytes")
        )

    def _device_put(self, batch):
        self._count_to_device(batch)
        if self.mesh is not None:
            from ..parallel.mesh import shard_tile_batch

            return shard_tile_batch(batch, self.mesh)
        return jax.tree.map(jnp.asarray, batch)

    # ------------------------------------------------------------------
    def _build_train_step(self):
        model, cfg = self.model, self.cfg
        tx_sim, bd_sim = self.tx_similarity, self.bd_similarity

        def tile_losses(params, tile: TileGraph, key,
                        deterministic=False):
            k_drop, k_tx, k_bd, k_sg = jax.random.split(key, 4)
            emb = model.apply(
                params, tile, deterministic=deterministic,
                rngs={"dropout": k_drop},
            )
            return L.loss_stats(
                k_tx, k_bd, k_sg, emb, tile, tx_sim, bd_sim,
                tx_margin=cfg.tx_margin, sg_margin=cfg.sg_margin,
                sg_loss_type=cfg.sg_loss_type, use_interior=True,
            )

        def loss_fn(params, batch: TileGraph, key, weights,
                    deterministic=False):
            b = batch.tx_gene.shape[0]
            keys = jax.random.split(key, b)
            stats = jax.vmap(
                lambda t, k: tile_losses(params, t, k, deterministic)
            )(batch, keys)
            tot = stats.sum(axis=0)  # joint masked means across tiles
            l_tx = tot[0] / jnp.maximum(tot[1], 1.0)
            l_bd = tot[2] / jnp.maximum(tot[3], 1.0)
            l_sg = tot[4] / jnp.maximum(tot[5], 1.0)
            loss = weights[0] * l_tx + weights[1] * l_bd + weights[2] * l_sg
            return loss, (l_tx, l_bd, l_sg)

        @jax.jit
        def train_step(params, opt_state, batch, key, weights):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key, weights
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        @jax.jit
        def eval_step(params, batch, key, weights):
            # eval mode: no dropout (the reference validates through
            # Lightning's eval mode); triplet sampling keys still apply
            return loss_fn(params, batch, key, weights,
                           deterministic=True)

        @jax.jit
        def scan_train(params, opt_state, batches, keys, weights):
            """S optimizer steps in one dispatch (lax.scan over a
            super-stacked batch with leading step axis)."""

            def body(carry, xs):
                p, o = carry
                batch, key = xs
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(p, batch, key, weights)
                updates, o = self.tx.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), jnp.stack([loss, *aux])

            (params, opt_state), metrics = jax.lax.scan(
                body, (params, opt_state), (batches, keys)
            )
            return params, opt_state, metrics

        self._scan_train = scan_train
        return train_step, eval_step

    # ------------------------------------------------------------------
    def _build_predict_step(self):
        model = self.model

        def predict_tile(params, tile: TileGraph):
            from ..ops import score_candidates

            emb = model.apply(params, tile, deterministic=True)
            max_sim, seg = score_candidates(
                emb["tx"], emb["bd"], tile.cand, tile.bd_index,
                # bf16 runs score in bf16 (halves the row-rate-bound
                # candidate gather; cosines still accumulate f32)
                dtype=(
                    jnp.bfloat16
                    if self.cfg.compute_dtype == "bfloat16" else None
                ),
                normalized=self.cfg.normalize_embeddings,
            )
            mask = tile.tx_interior & tile.tx_valid
            return (tile.tx_index, seg, max_sim, tile.tx_gene, mask)

        @jax.jit
        def predict_step(params, batch):
            return jax.vmap(lambda t: predict_tile(params, t))(batch)

        return predict_step

    # ------------------------------------------------------------------
    def _batch_plans(
        self,
        tiles: Sequence[TileSpec],
        shuffle: bool,
        rng: Optional[np.random.Generator] = None,
        use_xlo: bool = False,
    ):
        """Bin-pack tile specs into stacked-batch plans (spec lists +
        merged bucket shapes).

        Edge-budget bin-packing doubles as shape bucketing: tiles packed
        into one bin share a merged bucket (SURVEY §7; reference budget
        semantics sampler.py:292-405).

        ``use_xlo``: enable the third (deg<=4, K=4) degree bucket.
        Measured on v5e: the xlo split is a FORWARD win (fwd 7.04 ->
        6.49 ms, predict 8.02 -> 7.38) but a backward LOSS (+4 ms/step:
        its extra transpose table spans all n_tx source rows, growing
        the row-rate-bound dxl gather 8 -> 12 slots/row) — so predict
        plans enable it and training plans do not."""
        if not tiles:
            return []
        values = np.array([max(t.n_edges, 1) for t in tiles])
        packer = (
            first_fit_decreasing_bucketed
            if shuffle
            else best_fit_decreasing
        )
        kwargs = {"rng": rng} if shuffle else {}
        bins = packer(values, self.cfg.edges_per_batch, **kwargs)
        # bucket shapes for every tile up front, thread-parallel: at
        # whole-slide scale tile_bucket dominates planning (O(E_tile)
        # edge recompute per spec on the out-of-core plane), and the
        # scratch maps in _tile_edges are thread-local
        from concurrent.futures import ThreadPoolExecutor

        from ..utils_profiling import substage

        with substage("plan.tile_bucket", items=len(tiles)):
            if len(tiles) >= 64:
                import os as _os

                with ThreadPoolExecutor(
                    max_workers=min(4, _os.cpu_count() or 1)
                ) as ex:
                    all_shapes = list(
                        ex.map(lambda s: tile_bucket(self.graph, s),
                               tiles)
                    )
            else:
                all_shapes = [tile_bucket(self.graph, s) for s in tiles]
        plans = []
        m = self.cfg.tiles_per_step
        per_bin = []
        import dataclasses as _dc

        for bin_idx in bins:
            specs = [tiles[i] for i in bin_idx]
            shapes = [all_shapes[i] for i in bin_idx]
            bucket = merge_buckets(shapes)
            if not use_xlo and bucket.n_xlo:
                bucket = _dc.replace(bucket, n_xlo=0, k_xlo=0)
            per_bin.append((specs, bucket))
        if self.cfg.shape_merge == "global" and per_bin:
            # one padded shape for the whole pass -> one compiled
            # program per scan depth (compilation dominates whole-slide
            # wall-clock; see TrainConfig.shape_merge)
            g = merge_buckets([b for _, b in per_bin])
            per_bin = [(specs, g) for specs, _ in per_bin]
        for specs, bucket in per_bin:
            for s in range(0, len(specs), m):
                plans.append((specs[s : s + m], bucket))
        return plans

    def _extract_cached(
        self, spec: TileSpec, bucket, cache: bool = True
    ) -> TileGraph:
        """extract_tile with an epoch-spanning cache.

        Keyed by (spec identity, bucket shape): under 'global' shape
        merge both are stable across epochs, so re-shuffled epochs
        reuse the padded arrays and only restack.  ``cache=False``
        (the predict path: every tile visited exactly once) still reads
        hits but never inserts, so single-use extractions don't pin
        host RAM for zero reuse."""
        from ..utils_profiling import substage

        if self.cfg.tile_cache_gb <= 0:
            with substage("extract.tile"):
                return extract_tile(self.graph, spec, bucket)
        import dataclasses

        k = (id(spec), dataclasses.astuple(bucket))
        hit = self._tile_cache.get(k)
        if hit is not None:
            return hit[1]
        with substage("extract.tile"):
            t = extract_tile(self.graph, spec, bucket)
        if not cache:
            return t
        nb = sum(
            a.nbytes for a in jax.tree.leaves(t) if hasattr(a, "nbytes")
        )
        if (self._tile_cache_bytes + nb
                <= self.cfg.tile_cache_gb * 1e9):
            # the spec rides in the value to pin its id() for the key
            self._tile_cache[k] = (spec, t)
            self._tile_cache_bytes += nb
        return t

    def _build_batch(self, plan, cache: bool = True) -> TileGraph:
        specs, bucket = plan
        f_bd = self.graph.bd_x.shape[1]
        tgs = [self._extract_cached(s, bucket, cache) for s in specs]
        # round tile count to a multiple of tiles_per_step with empty
        # (all-masked) tiles
        while len(tgs) % self.cfg.tiles_per_step:
            tgs.append(
                empty_tile(
                    bucket, f_bd,
                    c_tx=self.graph.tx_similarity.shape[0],
                    c_bd=self.graph.bd_similarity.shape[0],
                )
            )
        return stack_tiles(tgs)

    def iter_batches(
        self,
        tiles: Sequence[TileSpec],
        shuffle: bool,
        rng: Optional[np.random.Generator] = None,
        prefetch: int = 2,
        cache: bool = True,
        use_xlo: bool = False,
    ):
        """Stream stacked batches with background-thread extraction
        (overlaps host tile building with device compute — the
        DataLoader-worker analogue, reference data_module.py:346-366)."""
        from .prefetch import PrefetchIterator

        plans = self._batch_plans(tiles, shuffle, rng, use_xlo=use_xlo)
        return PrefetchIterator(
            plans, lambda p: self._build_batch(p, cache), depth=prefetch
        )

    def make_batches(
        self,
        tiles: Sequence[TileSpec],
        shuffle: bool,
        rng: Optional[np.random.Generator] = None,
        cache: bool = False,
    ) -> List[TileGraph]:
        """Eagerly materialize all batches (small runs / templates).

        Eager batches are held by the caller and reused directly, so
        inserting their extractions into the epoch-spanning tile cache
        would pin host RAM for zero reuse — ``cache`` defaults off."""
        return [
            self._build_batch(p, cache)
            for p in self._batch_plans(tiles, shuffle, rng)
        ]

    # ------------------------------------------------------------------
    def fit(
        self,
        fit_tiles: Sequence[TileSpec],
        max_epochs: Optional[int] = None,
        on_epoch_end=None,
    ) -> List[Dict]:
        """Train/val loop with tile split + per-epoch repacking
        (reference: data_module.py:294-306, sampler regeneration).

        ``on_epoch_end(epoch, trainer)``: optional callback invoked
        after each epoch's metrics record (the Lightning-callback
        analogue; used e.g. by the quality-saturation sweep to predict
        at intermediate epochs without disturbing the run's PRNG or
        weight schedules)."""
        cfg = self.cfg
        max_epochs = (
            cfg.max_epochs if max_epochs is None else max_epochs
        )
        rng = np.random.default_rng(cfg.seed)
        n = len(fit_tiles)
        perm = rng.permutation(n)
        split = int(cfg.training_fraction * n)
        train_tiles = [fit_tiles[i] for i in perm[:split]]
        val_tiles = [fit_tiles[i] for i in perm[split:]]
        if not train_tiles:
            train_tiles = list(fit_tiles)

        # val plans are static; batches are rebuilt per epoch through
        # the bounded tile cache rather than materialized eagerly —
        # holding every padded val tile for the whole run is O(n_tiles)
        # host RAM (a ~10 GB resident at the 105M-transcript scale)
        val_plans = self._batch_plans(val_tiles, shuffle=False)

        if self.params is None:
            probe = self.make_batches(train_tiles[:1], shuffle=False)[0]
            template = jax.tree.map(lambda x: x[0], probe)
            self.init(template)
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)
        if self._train_step is None:
            self._train_step, self._eval_step = self._build_train_step()

        base_key = jax.random.PRNGKey(cfg.seed + 1)
        w_start = np.array(
            [cfg.tx_weight_start, cfg.bd_weight_start, cfg.sg_weight_start]
        )
        w_end = np.array(
            [cfg.tx_weight_end, cfg.bd_weight_end, cfg.sg_weight_end]
        )

        start_epoch = 0
        if cfg.checkpoint_dir:
            from pathlib import Path

            from .checkpoint import load_checkpoint

            latest = Path(cfg.checkpoint_dir) / "latest.npz"
            if latest.exists():
                self.params, self.opt_state, meta = load_checkpoint(
                    latest, self.params, self.opt_state
                )
                start_epoch = int(
                    meta.get("extra", {}).get("epoch", -1)
                ) + 1
                logger.info("resumed from epoch %d", start_epoch)

        for epoch in range(start_epoch, max_epochs):
            weights = jnp.asarray(
                L.cosine_weight_schedule(epoch, max_epochs, w_start, w_end)
            )
            # per-epoch streams derived from the epoch index, so a
            # checkpoint resume at epoch e consumes exactly the keys
            # and shuffles an uninterrupted run would at epoch e
            # (instead of replaying epoch 0's streams)
            key = jax.random.fold_in(base_key, epoch)
            erng = np.random.default_rng([cfg.seed, epoch])
            # the extraction cache only pays across epochs: on the LAST
            # epoch nothing will re-read an inserted tile, so inserting
            # just pins host RAM through predict/write (the 24 GB
            # whole-slide RSS lever, docs/runs/xenium_50m_outofcore.json)
            batches = self.iter_batches(train_tiles, shuffle=True,
                                        rng=erng,
                                        cache=epoch < max_epochs - 1)
            ep_loss = []
            if cfg.scan_steps > 1:
                key, ep_loss = self._run_scanned_epoch(
                    batches, key, weights
                )
            else:
                for batch in batches:
                    key, sub = jax.random.split(key)
                    batch = self._device_put(batch)
                    self.params, self.opt_state, loss, aux = (
                        self._train_step(
                            self.params, self.opt_state, batch, sub,
                            weights,
                        )
                    )
                    ep_loss.append(
                        [float(loss)] + [float(a) for a in aux]
                    )
            rec = {
                "epoch": epoch,
                "train:loss": float(np.mean([r[0] for r in ep_loss])),
                "train:loss_tx": float(np.mean([r[1] for r in ep_loss])),
                "train:loss_bd": float(np.mean([r[2] for r in ep_loss])),
                "train:loss_sg": float(np.mean([r[3] for r in ep_loss])),
            }
            if val_plans:
                from .prefetch import PrefetchIterator

                vl = []
                use_cache = epoch < max_epochs - 1
                for batch in PrefetchIterator(
                    val_plans,
                    lambda p: self._build_batch(p, cache=use_cache),
                ):
                    key, sub = jax.random.split(key)
                    batch = self._device_put(batch)
                    loss, aux = self._eval_step(
                        self.params, batch, sub, weights
                    )
                    vl.append([float(loss)] + [float(a) for a in aux])
                rec.update(
                    {
                        "val:loss": float(np.mean([r[0] for r in vl])),
                        "val:loss_tx": float(np.mean([r[1] for r in vl])),
                        "val:loss_bd": float(np.mean([r[2] for r in vl])),
                        "val:loss_sg": float(np.mean([r[3] for r in vl])),
                    }
                )
            logger.info("epoch %d: %s", epoch, rec)
            self.history.append(rec)
            if on_epoch_end is not None:
                on_epoch_end(epoch, self)
            if (
                cfg.checkpoint_dir
                and cfg.checkpoint_every
                and (epoch + 1) % cfg.checkpoint_every == 0
            ):
                from pathlib import Path

                from .checkpoint import save_checkpoint

                save_checkpoint(
                    Path(cfg.checkpoint_dir) / "latest.npz",
                    self.params,
                    self.opt_state,
                    config=self.cfg,
                    extra={"epoch": epoch},
                )
        return self.history

    # ------------------------------------------------------------------
    def _run_scanned_epoch(self, batches, key, weights):
        """Run shape-identical batches scan_steps at a time inside
        single dispatches.

        Streaming: a full-depth chunk dispatches as soon as its
        signature group reaches ``scan_steps`` batches, so host RAM
        holds at most (scan_steps - 1) pending batches per signature
        (not the whole epoch) and extraction overlaps device compute
        through the prefetch iterator.  Remainders flush at epoch end
        through a stable depth menu (descending powers of two): each
        distinct depth is a separate compiled program, so a raw
        remainder (1..s-1, varying with every repack) would recompile
        almost every epoch."""
        ep_loss = []
        s_depth = self.cfg.scan_steps

        def dispatch(chunk, key):
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *chunk)
            stacked = self._device_put_scan(stacked)
            key, *subs = jax.random.split(key, len(chunk) + 1)
            keys = jnp.stack(subs)
            self.params, self.opt_state, metrics = self._scan_train(
                self.params, self.opt_state, stacked, keys, weights
            )
            for row in np.asarray(metrics):
                ep_loss.append([float(v) for v in row])
            return key

        pending: Dict[tuple, list] = {}
        for batch in batches:
            leaves, treedef = jax.tree.flatten(batch)
            # treedef carries the tile's static metadata (tt_n_lo /
            # tt_k_lo / transposes_extended) — batches may only stack
            # when it matches, not just the leaf shapes
            sig = (
                treedef,
                tuple((tuple(x.shape), str(x.dtype)) for x in leaves),
            )
            group = pending.setdefault(sig, [])
            group.append(batch)
            if len(group) == s_depth:
                key = dispatch(group, key)
                pending[sig] = []
        for group in pending.values():
            n_left = len(group)
            p = 1
            while p * 2 <= max(n_left, 1):
                p *= 2
            i = 0
            while n_left > 0:
                while p > n_left:
                    p //= 2
                key = dispatch(group[i : i + p], key)
                i += p
                n_left -= p
        return key, ep_loss

    def _device_put_scan(self, stacked):
        self._count_to_device(stacked)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # step axis replicated, tile axis sharded
            sharding = NamedSharding(self.mesh, P(None, "data"))
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), stacked
            )
        return jax.tree.map(jnp.asarray, stacked)

    # ------------------------------------------------------------------
    def release_tile_cache(self) -> None:
        """Drop the epoch-spanning tile-extraction cache.  Its only
        value is across fit epochs; at whole-slide scale it pins up to
        ``tile_cache_gb`` (24 GB default) of host RAM through the
        predict/write stages for zero reuse."""
        self._tile_cache = {}
        self._tile_cache_bytes = 0

    def predict(
        self, predict_tiles: Sequence[TileSpec]
    ) -> Dict[str, np.ndarray]:
        """Run prediction over halo tiles; returns flat arrays of
        (row_index, cell_encoding, similarity, gene) for interior
        transcripts (reference: lightning_model.py:263-298)."""
        self.release_tile_cache()
        if self._predict_step is None:
            self._predict_step = self._build_predict_step()
        batches = self.iter_batches(predict_tiles, shuffle=False,
                                    cache=False, use_xlo=True)
        out = {k: [] for k in ("row_index", "cell_encoding",
                               "similarity", "gene")}
        for batch in batches:
            batch = self._device_put(batch)
            idx, seg, sim, gene, mask = jax.tree.map(
                np.asarray, self._predict_step(self.params, batch)
            )
            self.bytes_to_host += (
                idx.nbytes + seg.nbytes + sim.nbytes + gene.nbytes
                + mask.nbytes
            )
            m = mask.ravel()
            out["row_index"].append(idx.ravel()[m])
            out["cell_encoding"].append(seg.ravel()[m])
            out["similarity"].append(sim.ravel()[m])
            out["gene"].append(gene.ravel()[m])
        return {k: np.concatenate(v) if v else np.zeros(0)
                for k, v in out.items()}

    def predict_streaming(
        self,
        predict_tiles: Sequence[TileSpec],
        n_rows: Optional[int] = None,
        best_sim: Optional[np.ndarray] = None,
        best_enc: Optional[np.ndarray] = None,
    ) -> "Tuple[np.ndarray, np.ndarray]":
        """Prediction with O(n_rows) host memory: per-batch results are
        max-merged into dense row_index-addressed arrays instead of
        accumulating per-tile lists (the whole-slide RSS lever — the
        list-of-arrays path holds every halo tile's outputs plus a
        duplicated pre-dedupe table through the writer,
        docs/runs/xenium_50m_outofcore.json).

        The max-merge IS the reference's cross-tile dedupe
        (reference: writer.py:199-204) performed online; with
        exactly-once predict masks each row is written once and the
        merge degenerates to assignment.

        Returns ``(best_sim f32, best_enc int32)`` addressed by
        row_index: ``enc == -2`` never predicted, ``-1`` predicted but
        unassigned.  Pass preallocated (possibly memmapped) arrays to
        cap RSS further.
        """
        self.release_tile_cache()
        if self._predict_step is None:
            self._predict_step = self._build_predict_step()
        if best_sim is None:
            if n_rows is None:
                n_rows = int(self.graph.tx_index.max()) + 1
            best_sim = np.full(n_rows, -np.inf, np.float32)
            best_enc = np.full(n_rows, -2, np.int32)
        batches = self.iter_batches(predict_tiles, shuffle=False,
                                    cache=False, use_xlo=True)
        for batch in batches:
            batch = self._device_put(batch)
            idx, seg, sim, gene, mask = jax.tree.map(
                np.asarray, self._predict_step(self.params, batch)
            )
            self.bytes_to_host += (
                idx.nbytes + seg.nbytes + sim.nbytes + gene.nbytes
                + mask.nbytes
            )
            m = mask.ravel()
            r = idx.ravel()[m].astype(np.int64)
            s = sim.ravel()[m]
            e = seg.ravel()[m]
            # resolve intra-batch duplicates (none under exactly-once
            # masks, but halo variants may overlap): row-major sort,
            # best similarity first
            if r.size:
                order = np.lexsort((-s, r))
                first = np.empty(order.size, bool)
                first[0] = True
                first[1:] = r[order[1:]] != r[order[:-1]]
                keep = order[first]
                rk, sk, ek = r[keep], s[keep], e[keep]
                upd = sk > best_sim[rk]
                # never-predicted rows always take the new value (their
                # sim is -inf), preserving unassigned (-1) markers
                rk, sk, ek = rk[upd], sk[upd], ek[upd]
                best_sim[rk] = sk
                best_enc[rk] = ek
        return best_sim, best_enc

    # ------------------------------------------------------------------
    def predict_whole_slide(
        self, mesh=None, grid: Optional[Tuple[int, int]] = None
    ) -> Dict[str, np.ndarray]:
        """Distributed whole-slide prediction via halo exchange: the
        graph is strip-partitioned over the mesh and boundary features
        are ppermuted per layer — exact (no margins/dedupe), the
        TPU-native replacement for halo-tile prediction
        (``segger_tpu.parallel.halo``).  ``grid=(dx, dy)`` selects the
        2-D decomposition (``segger_tpu.parallel.grid``) for slides
        large in both axes; ``mesh`` is ignored in that case."""
        if grid is not None:
            from ..parallel.grid import grid_predict, make_grid_mesh

            return grid_predict(
                self.model, self.params, self.graph,
                make_grid_mesh(*grid),
            )
        from ..parallel.halo import sharded_predict

        mesh = mesh or self.mesh
        if mesh is None:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh()
        return sharded_predict(self.model, self.params, self.graph, mesh)

    # ------------------------------------------------------------------
    def fit_whole_slide(
        self, mesh=None, max_epochs: Optional[int] = None,
        grid: Optional[Tuple[int, int]] = None,
    ) -> List[Dict]:
        """Margin-free whole-slide training over the device mesh.

        The tile-DP :meth:`fit` reproduces the reference's semantics
        (margin tiles, cross-tile edges dropped, tile_dataset.py:50-60);
        this path strip-shards the slide itself and trains with exact
        receptive fields — per-layer halo exchange in the forward,
        gradients returned through the ``ppermute`` VJP, loss statistics
        ``psum``-reduced into exact whole-slide masked means
        (``parallel.halo.make_sharded_train_step``).  One optimizer step
        per epoch (the whole slide is the batch).  ``grid=(dx, dy)``
        selects the 2-D decomposition (``segger_tpu.parallel.grid``);
        ``mesh`` is ignored in that case."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = self.cfg
        max_epochs = (
            cfg.max_epochs if max_epochs is None else max_epochs
        )

        if grid is not None:
            from ..parallel.grid import (
                build_grid_sharded_graph, make_grid_mesh,
                make_grid_train_step,
            )

            mesh = make_grid_mesh(*grid)
            stacked, halo, dropped = build_grid_sharded_graph(
                self.graph, *grid, for_training=True
            )
            spec = P(("x", "y"))
            mk_step = lambda: make_grid_train_step(  # noqa: E731
                self.model, self.tx, mesh,
                self.tx_similarity, self.bd_similarity,
                tx_margin=cfg.tx_margin, sg_margin=cfg.sg_margin,
                sg_loss_type=cfg.sg_loss_type,
            )
        else:
            from ..parallel.halo import (
                build_sharded_graph, make_sharded_train_step,
            )

            mesh = mesh or self.mesh
            if mesh is None:
                from ..parallel.mesh import make_mesh

                mesh = make_mesh()
            stacked, halo, dropped = build_sharded_graph(
                self.graph, mesh.shape["data"], for_training=True
            )
            spec = P("data")
            mk_step = lambda: make_sharded_train_step(  # noqa: E731
                self.model, self.tx, mesh,
                self.tx_similarity, self.bd_similarity,
                tx_margin=cfg.tx_margin, sg_margin=cfg.sg_margin,
                sg_loss_type=cfg.sg_loss_type,
            )
        if dropped.any():
            logger.warning(
                "whole-slide training dropped %s non-adjacent-shard "
                "edges (tt, sg, cand)", dropped.tolist(),
            )
        if self.params is None:
            template = jax.tree.map(lambda x: np.asarray(x)[0], stacked)
            self.init(template)
        sharding = NamedSharding(mesh, spec)
        # put_sharded feeds each device its shard directly (no transient
        # whole-slide copy on device 0, multi-host safe)
        from ..parallel.halo import put_sharded

        stacked = put_sharded(stacked, sharding)
        halo = put_sharded(halo, sharding)
        step = mk_step()
        base_key = jax.random.PRNGKey(cfg.seed + 1)
        w_start = np.array(
            [cfg.tx_weight_start, cfg.bd_weight_start, cfg.sg_weight_start]
        )
        w_end = np.array(
            [cfg.tx_weight_end, cfg.bd_weight_end, cfg.sg_weight_end]
        )
        history = []
        for epoch in range(max_epochs):
            weights = jnp.asarray(
                L.cosine_weight_schedule(epoch, max_epochs, w_start, w_end)
            )
            sub = jax.random.fold_in(base_key, epoch)
            self.params, self.opt_state, loss, aux = step(
                self.params, self.opt_state, stacked, halo, sub, weights
            )
            rec = {
                "epoch": epoch,
                "train:loss": float(loss),
                "train:loss_tx": float(aux[0]),
                "train:loss_bd": float(aux[1]),
                "train:loss_sg": float(aux[2]),
            }
            history.append(rec)
            logger.info(
                "whole-slide epoch %d: loss=%.4f", epoch, rec["train:loss"]
            )
        self.history = history
        return history
