"""Checkpointing with last/best-by-mAP semantics, built on orbax.

Native equivalent of the reference Checkpointer
(reference: src/dagr/utils/logging.py:14-98): saves the full train
state (params, EMA, optimizer, schedule step, epoch) every epoch as
``last_model``, keeps ``best_model_mAP_<x>`` on validation improvement,
restores latest or best (mAP parsed from the directory name), and
supports auto-resume from an existing output directory.
"""
from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _save_tree(path: Path, tree: Any):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree))
    ckptr.wait_until_finished()


def _load_tree(path: Path, target: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target=target)


class Checkpointer:
    def __init__(self, output_directory: Path):
        self.dir = Path(output_directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.best_map = -1.0
        # resume best-so-far from existing best checkpoints (logging.py:31-48)
        for p in self.dir.glob("best_model_mAP_*"):
            m = re.search(r"mAP_([0-9.]+?)/?$", p.name)
            if m:
                self.best_map = max(self.best_map, float(m.group(1)))

    def checkpoint(self, state, epoch: int, name: str = "last_model"):
        _save_tree(self.dir / name, state)
        meta = {"epoch": int(epoch)}
        (self.dir / f"{name}.meta.json").write_text(json.dumps(meta))

    def process(self, metrics: Dict[str, float], epoch: int, state) -> bool:
        """Keep best by mAP (reference: logging.py:75-98)."""
        cur = float(metrics.get("mAP", 0.0))
        if cur > self.best_map:
            # drop previous best
            for p in self.dir.glob("best_model_mAP_*"):
                if p.is_dir():
                    shutil.rmtree(p)
                else:
                    p.unlink()
            self.best_map = cur
            self.checkpoint(state, epoch, name=f"best_model_mAP_{cur:.4f}")
            return True
        return False

    def restore_if_existing(
        self, state_target, best: bool = False
    ) -> Tuple[Optional[Any], int]:
        """Returns (state or None, start_epoch)."""
        name = None
        if best:
            cands = [p for p in self.dir.glob("best_model_mAP_*")
                     if p.is_dir()]
            if cands:
                name = max(
                    cands, key=lambda p: float(p.name.rsplit("_", 1)[-1])
                ).name
        if name is None and (self.dir / "last_model").exists():
            name = "last_model"
        if name is None:
            return None, 0
        state = _load_tree(self.dir / name, state_target)
        meta_file = self.dir / f"{name}.meta.json"
        epoch = 0
        if meta_file.exists():
            epoch = json.loads(meta_file.read_text()).get("epoch", 0) + 1
        return state, epoch


def load_eval_checkpoint(state, cfg) -> Tuple[Any, bool]:
    """Resolve ``cfg.checkpoint`` into eval weights, shared by the eval
    CLIs: a reference-style torch ``.pth``/``.pt`` file loads through
    the converter (day-one parity with ``dagr_s_50.pth``, reference:
    readme.md:66-76 + scripts/run_test.py:57-58); anything else
    restores the orbax best-then-last checkpoint.  Returns
    ``(state, loaded)``."""
    if not cfg.checkpoint:
        return state, False
    path = Path(cfg.checkpoint)
    if path.suffix in (".pth", ".pt"):
        from dagr_tpu.models.torch_import import load_reference_checkpoint

        params, stats = load_reference_checkpoint(path, cfg)
        return state.replace(params=params, batch_stats=stats,
                             ema_params=params, ema_stats=stats), True
    restored, _ = Checkpointer(path.parent).restore_if_existing(
        state, best=True)
    if restored is not None:
        return restored, True
    return state, False
