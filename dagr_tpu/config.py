"""Configuration system: YAML + CLI merge with CLI precedence.

Mirrors the semantics of the reference flag system
(reference: src/dagr/utils/args.py:54-110 — argparse with
``default=argparse.SUPPRESS`` so YAML fills any key the CLI didn't set),
re-expressed as a typed dataclass so configs are explicit and hashable
where jit needs them to be static.
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Tuple

import yaml


@dataclass(frozen=True)
class DagrConfig:
    """Full model + training configuration.

    Field names follow the reference YAML schema
    (reference: config/dagr-{n,s,m,l}-dsec.yaml, dagr-l-ncaltech.yaml)
    so reference configs load unmodified.
    """

    # task
    task: str = "detection"
    dataset: str = "dsec"

    # paths (not needed for pure-model use)
    dataset_directory: str = ""
    output_directory: str = "./logs"
    checkpoint: str = ""
    img_net_checkpoint: str = ""
    exp_name: str = "default"
    # validation bbox-overlay images written per eval epoch (reference
    # logs these to wandb, utils/logging.py:119-211)
    n_viz_images: int = 4

    # graph params (reference: config/dagr-s-dsec.yaml:8-12)
    radius: float = 0.01
    time_window_us: int = 1_000_000
    max_neighbors: int = 16
    n_nodes: int = 50_000
    max_queue_size: int = 128  # reference: model/layers/ev_tgn.py:24

    # network params
    activation: str = "relu"
    edge_attr_dim: int = 2
    aggr: str = "sum"
    kernel_size: int = 5
    pooling_aggr: str = "max"
    base_width: float = 0.5
    after_pool_width: float = 1.0
    net_stem_width: float = 0.5
    yolo_stem_width: float = 0.5
    num_scales: int = 2
    pooling_dim_at_output: str = "5x7"
    keep_temporal_ordering: bool = False
    use_image: bool = False
    no_events: bool = False
    pretrain_cnn: bool = False
    img_net: str = "resnet18"

    # learning params
    batch_size: int = 64
    weight_decay: float = 1e-5
    clip: float = 0.1
    l_r: float = 2e-4
    tot_num_epochs: int = 801
    aug_trans: float = 0.1
    aug_zoom: float = 1.5
    aug_p_flip: float = 0.5
    no_eval: bool = False
    num_interframe_steps: int = 10

    # resume training from an explicit checkpoint directory
    # (reference: scripts/train_dsec.py:164-166, --resume_checkpoint)
    resume_checkpoint: str = ""

    # TPU-native additions (no reference counterpart; see SURVEY.md §7)
    # number of data-parallel shards; 1 = single chip
    dp: int = 1
    # streaming chunk size for the incremental engine
    stream_chunk: int = 1024
    # node chunk for the spline-conv edge pipeline (bounds VMEM/HBM use)
    node_chunk: int = 2048
    # sync graph-builder formulation: "slab" rides the packed per-pixel
    # FIFO fast path (graph/slab.py; 5.6 vs 22.4 ms/window measured at
    # flagship scale) with a lax.cond fallback to the exact sort-merge
    # join whenever a depth-Q view could differ, so the result is
    # bit-identical either way; "sort" forces the one-shot merge join
    graph_fast_path: str = "slab"

    def replace(self, **kw) -> "DagrConfig":
        return dataclasses.replace(self, **kw)

    # -- derived static geometry ------------------------------------------

    @property
    def num_classes(self) -> int:
        return {"dsec": 2, "ncaltech101": 100}.get(self.dataset, 2)

    def pooling_sizes(self) -> Tuple[Tuple[float, float], ...]:
        """Normalized (vx, vy) voxel sizes of the 4 pooling layers.

        reference: model/networks/net.py:19-28 (compute_pooling_at_each_layer)
        """
        py, px = map(int, self.pooling_dim_at_output.split("x"))
        out = []
        for i in range(4):
            out.append((1.0 / px / 2 ** (3 - i), 1.0 / py / 2 ** (3 - i)))
        return tuple(out)

    def grid_shapes(self) -> Tuple[Tuple[int, int], ...]:
        """(ny, nx) cell counts of each pooled grid (reference
        num_grid_cells, model/layers/pooling.py:43-45)."""
        return tuple(
            (int(1.0 / vy + 1e-3), int(1.0 / vx + 1e-3))
            for (vx, vy) in self.pooling_sizes()
        )

    def output_sizes(self, num_scales: Optional[int] = None) -> Tuple[Tuple[int, int], ...]:
        """Dense output canvas (H', W') per detection scale
        (reference: model/networks/net.py:103-106)."""
        n = num_scales if num_scales is not None else self.num_scales
        return self.grid_shapes()[-2:][-n:]

    def strides(self, height: int) -> Tuple[int, ...]:
        """YOLO strides per scale (reference: model/networks/net.py:69-70)."""
        import math

        sizes = self.pooling_sizes()[-2:]
        s = tuple(int(math.ceil(vy * height)) for (_, vy) in sizes)
        return s[-self.num_scales:]

    def channels(self) -> Tuple[int, ...]:
        """Backbone channel plan (reference: model/networks/net.py:35-38)."""
        return (
            1,
            int(self.base_width * 32),
            int(self.after_pool_width * 64),
            int(self.net_stem_width * 128),
            int(self.net_stem_width * 128),
            int(self.net_stem_width * 128),
        )

    def effective_radius(self, width: int) -> float:
        """Cartesian max_value for the event graph
        (reference: model/networks/net.py:72)."""
        return 2 * float(int(self.radius * width + 2) / width)

    def cartesian_max_values(self, width: int) -> Tuple[float, ...]:
        """Edge-attr normalization (Cartesian max_value) per level:
        [event graph, G1, G2, G3, G4].

        reference: model/networks/net.py:68,72-97 — the event level uses
        effective_radius, pool1's transform uses 2*effective_radius, and
        pools 2-4 use 2*max(voxel_size_xy) of their level.
        """
        eff = self.effective_radius(width)
        sizes = self.pooling_sizes()
        return (
            eff,
            2 * eff,
            2 * max(sizes[1]),
            2 * max(sizes[2]),
            2 * max(sizes[3]),
        )

    def radius_px(self, width: int) -> int:
        """Integer search radius in pixels
        (reference: model/layers/ev_tgn.py:29)."""
        return int(self.radius * width + 1)

    def delta_t_us(self) -> int:
        """Temporal edge cutoff (reference: model/layers/ev_tgn.py:28)."""
        return int(self.radius * self.time_window_us)


def load_yaml(path: Path) -> dict:
    with Path(path).open() as f:
        return yaml.safe_load(f) or {}


def config_from_yaml(path: Path, **overrides) -> DagrConfig:
    """Build a config from a YAML file plus keyword overrides
    (CLI/overrides win, YAML fills the rest; reference: utils/args.py:104-110)."""
    raw = load_yaml(path)
    fields = {f.name for f in dataclasses.fields(DagrConfig)}
    known = {k: v for k, v in raw.items() if k in fields}
    known.update({k: v for k, v in overrides.items() if v is not None and k in fields})
    # coerce path-like fields to str
    for k in ("dataset_directory", "output_directory", "checkpoint", "img_net_checkpoint"):
        if k in known and known[k] is not None:
            known[k] = str(known[k])
    return DagrConfig(**known)


def add_config_flags(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Register every DagrConfig field as an optional CLI flag with
    SUPPRESS defaults, reference-style (utils/args.py:7-52)."""
    for f in dataclasses.fields(DagrConfig):
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(f"--{f.name}", action="store_true", default=argparse.SUPPRESS)
        else:
            ty = type(f.default) if f.default is not None else str
            parser.add_argument(f"--{f.name}", type=ty, default=argparse.SUPPRESS)
    return parser


def parse_flags(argv=None) -> DagrConfig:
    parser = argparse.ArgumentParser("dagr_tpu")
    parser.add_argument("--config", type=Path, default=None)
    add_config_flags(parser)
    args = parser.parse_args(argv)
    overrides = {k: v for k, v in vars(args).items() if k != "config"}
    if args.config is not None:
        return config_from_yaml(args.config, **overrides)
    return DagrConfig(**overrides)
