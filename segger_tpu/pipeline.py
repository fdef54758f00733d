"""End-to-end segmentation pipeline: the datamodule+trainer orchestration.

The TPU-native analogue of the reference's ``ISTDataModule`` + Lightning
``Trainer`` wiring (reference: src/segger/data/data_module.py:71-384,
src/segger/cli/segment.py:336-413): standardize inputs, build features and
the whole-slide graph, tile it, train, predict with halos, and write the
assignment table.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Literal, Optional

import numpy as np
import pandas as pd

from .io.fields import (
    StandardTranscriptFields,
    StandardBoundaryFields,
)
from .compat.anndata_lite import AnnDataLite
from .data.features import setup_features
from .data.assemble import build_host_graph, HostGraph
from .data.partition import make_fit_tiles, make_predict_tiles, build_tiling
from .data.writer import SegmentationWriter
from .geometry.morphology import polygon_props
from .train.trainer import SeggerTrainer, TrainConfig

logger = logging.getLogger(__name__)


@dataclass
class PipelineConfig:
    """Data-side knobs (defaults follow ISTDataModule,
    reference: data_module.py:135-161)."""

    cells_representation_mode: Literal["pca", "morphology"] = "pca"
    cells_embedding_size: int = 128
    cells_min_counts: int = 10
    cells_clusters_n_neighbors: int = 10
    cells_clusters_resolution: float = 2.0
    genes_min_counts: int = 100
    genes_clusters_n_neighbors: int = 5
    genes_clusters_resolution: float = 2.0
    transcripts_graph_max_k: int = 5
    transcripts_graph_max_dist: float = 5.0
    segmentation_graph_mode: Literal["nucleus", "cell"] = "nucleus"
    prediction_graph_mode: Literal["nucleus", "cell", "uniform"] = "cell"
    prediction_graph_max_k: int = 3
    prediction_graph_buffer_ratio: float = 0.05
    tiling_mode: Literal["adaptive", "square"] = "adaptive"
    tiling_nodes_per_tile: int = 50_000
    tiling_side_length: float = 250.0
    tiling_margin_training: float = 20.0
    tiling_margin_prediction: float = 20.0
    gene_corr_reference_path: Optional[Path] = None
    gene_missing_strategy: Literal["error", "remove", "fill"] = "error"
    seed: int = 0


class ISTPipeline:
    """Holds the standardized data + derived graph/tiling and drives
    train/predict/write."""

    def __init__(
        self,
        transcripts,
        boundaries: pd.DataFrame,
        polygons: dict,
        config: Optional[PipelineConfig] = None,
    ):
        """``polygons``: (cell_id, boundary_type) -> (V, 2) vertex array.

        ``transcripts``: a standardized DataFrame, or a
        :class:`segger_tpu.data.columnar.ColumnarTranscripts` table for
        out-of-core slides (typed arrays / disk-backed memmaps instead
        of object columns — see that module's docstring; the 10M-tx
        DataFrame path peaks at ~30 GB RSS, mostly strings).
        """
        config = PipelineConfig() if config is None else config
        self.tx_f = StandardTranscriptFields()
        self.bd_f = StandardBoundaryFields()
        self.transcripts = transcripts
        self.boundaries = boundaries
        self.polygons = polygons
        self.cfg = config
        self.adata: Optional[AnnDataLite] = None
        self.graph: Optional[HostGraph] = None
        self.tree = None

    # ------------------------------------------------------------------
    def load(self):
        """Feature + graph construction (reference: data_module.py:171-286)."""
        from .data.columnar import ColumnarTranscripts

        cfg, tx_f, bd_f = self.cfg, self.tx_f, self.bd_f
        tx = self.transcripts
        columnar = isinstance(tx, ColumnarTranscripts)

        # segmentation compartment mask (data_module.py:184-200)
        if cfg.segmentation_graph_mode == "nucleus":
            compartments = [tx_f.nucleus_value]
            boundary_type = bd_f.nucleus_value
        elif cfg.segmentation_graph_mode == "cell":
            compartments = [tx_f.nucleus_value, tx_f.cytoplasmic_value]
            boundary_type = bd_f.cell_value
        else:
            raise ValueError(
                f"Unrecognized segmentation graph mode: "
                f"'{cfg.segmentation_graph_mode}'."
            )
        if columnar:
            seg_mask = np.isin(np.asarray(tx.compartment),
                               np.asarray(compartments, np.int8))
            seg_mask &= np.asarray(tx.cell_code) >= 0
        else:
            seg_mask = np.asarray(
                tx[tx_f.compartment].isin(compartments).to_numpy()
            ).copy()
            seg_mask &= tx[tx_f.cell_id].notna().to_numpy()

        gene_corr_reference = None
        if cfg.gene_corr_reference_path is not None:
            from .compat.anndata_lite import read_h5ad

            gene_corr_reference = read_h5ad(cfg.gene_corr_reference_path)

        morph = None
        if cfg.cells_representation_mode == "morphology":
            items = [
                (cid, poly)
                for (cid, btype), poly in self.polygons.items()
                if btype == bd_f.cell_value
            ]
            props = polygon_props([p for _, p in items])
            props.index = [c for c, _ in items]
            morph = props

        logger.info("setup_features on %d masked transcripts",
                    int(seg_mask.sum()))
        feature_kwargs = dict(
            cells_embedding_size=cfg.cells_embedding_size,
            cells_min_counts=cfg.cells_min_counts,
            cells_clusters_n_neighbors=cfg.cells_clusters_n_neighbors,
            cells_clusters_resolution=cfg.cells_clusters_resolution,
            genes_min_counts=cfg.genes_min_counts,
            genes_clusters_n_neighbors=cfg.genes_clusters_n_neighbors,
            genes_clusters_resolution=cfg.genes_clusters_resolution,
            compute_morphology=(
                cfg.cells_representation_mode == "morphology"
            ),
            gene_corr_reference=gene_corr_reference,
            gene_missing_strategy=cfg.gene_missing_strategy,
            morphology_props=morph,
            seed=cfg.seed,
        )
        from .utils_profiling import substage

        if columnar:
            from .data.columnar import anndata_from_columnar
            from .data.features import setup_features_from_anndata

            with substage("features.count_matrix", items=tx.n):
                ad0 = anndata_from_columnar(tx, mask=seg_mask)
            self.adata = setup_features_from_anndata(ad0, **feature_kwargs)
        else:
            self.adata = setup_features(
                transcripts=tx[seg_mask],
                boundaries=self.boundaries,
                cell_column=tx_f.cell_id,
                **feature_kwargs,
            )

        # prediction polygons: mode-matching boundary type
        pred_type = (
            bd_f.cell_value
            if cfg.prediction_graph_mode == "cell"
            else bd_f.nucleus_value
        )
        poly_items = [
            (cid, poly)
            for (cid, btype), poly in self.polygons.items()
            if btype == pred_type
        ]

        logger.info("building whole-slide graph")
        graph_kwargs = dict(
            adata=self.adata,
            segmentation_mask=seg_mask,
            cells_embedding_key=(
                "X_pca"
                if cfg.cells_representation_mode == "pca"
                else "X_morphology"
            ),
            transcripts_graph_max_k=cfg.transcripts_graph_max_k,
            transcripts_graph_max_dist=cfg.transcripts_graph_max_dist,
            prediction_graph_mode=cfg.prediction_graph_mode,
            prediction_graph_max_k=cfg.prediction_graph_max_k,
            prediction_graph_buffer_ratio=cfg.prediction_graph_buffer_ratio,
            polygons=[p for _, p in poly_items] or None,
            polygon_cell_ids=np.array([c for c, _ in poly_items])
            if poly_items
            else None,
        )
        if columnar:
            from .data.assemble import build_host_graph_columnar

            self.graph = build_host_graph_columnar(tx, **graph_kwargs)
        else:
            self.graph = build_host_graph(transcripts=tx, **graph_kwargs)

        logger.info("tiling (%s, %d nodes/tile)", cfg.tiling_mode,
                    cfg.tiling_nodes_per_tile)
        self.tree = build_tiling(
            self.graph,
            nodes_per_tile=cfg.tiling_nodes_per_tile,
            mode=cfg.tiling_mode,
            side_length=cfg.tiling_side_length,
        )
        return self

    # ------------------------------------------------------------------
    def run(
        self,
        output_directory,
        train_config: Optional[TrainConfig] = None,
        save_anndata: bool = True,
        debug: bool = False,
    ) -> pd.DataFrame:
        """fit + predict + write (reference: cli/segment.py:336-413)."""
        if train_config is None:
            train_config = TrainConfig()
        if self.graph is None:
            self.load()
        trainer = SeggerTrainer(self.graph, train_config)
        fit_tiles = make_fit_tiles(
            self.graph, self.tree, margin=self.cfg.tiling_margin_training
        )
        trainer.fit(fit_tiles)
        predict_tiles = make_predict_tiles(
            self.graph, self.tree,
            margin=self.cfg.tiling_margin_prediction,
        )
        predictions = trainer.predict(predict_tiles)
        writer = SegmentationWriter(
            output_directory, save_anndata=save_anndata, debug=debug
        )
        seg = writer.write(
            predictions,
            cell_ids=self.graph.bd_cell_id,
            gene_names=self.adata.var.index.to_numpy().astype(str),
            # the h5ad export consumes a DataFrame; columnar runs skip
            # it (the assignment table itself is written either way)
            transcripts=(
                self.transcripts
                if isinstance(self.transcripts, pd.DataFrame) else None
            ),
        )
        self.trainer = trainer
        return seg
