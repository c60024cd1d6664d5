"""Durable checkpointing via Orbax.

The reference keeps best weights only in memory during training
(`/root/reference/healnet/utils/train_utils.py:59-84`) and durably saves just
``best_model.pt`` when the explainer flag is set (`main.py:163-168`). This is
the upgrade called for in SURVEY.md §5: full train-state checkpointing
(params + optimiser state + epoch + metrics) with atomic saves and resume.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Union

import orbax.checkpoint as ocp


class Checkpointer:
    """Save/restore full training state under a run directory."""

    def __init__(self, directory: Union[str, Path]):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def step_path(self, step: int) -> Path:
        """Directory of a saved step (e.g. for retention management)."""
        return self.directory / f"step_{step:08d}"

    def _step_numbers(self) -> list:
        """Sorted step numbers of FINALIZED checkpoints.

        Robust to stale orbax temp dirs (``step_XXXXXXXX.orbax-checkpoint-
        tmp-<ts>``) left behind by a crash mid-save — exactly the situation
        resume exists for — which would otherwise break the int parse.
        """
        steps = []
        for p in self.directory.glob("step_*"):
            suffix = p.name.split("_", 1)[1]
            if suffix.isdigit():
                steps.append(int(suffix))
        return sorted(steps)

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any = None,
        metrics: Optional[Dict[str, Any]] = None,
        keep_tag: str = "latest",
        keep_last: Optional[int] = None,
    ) -> Path:
        path = self.step_path(step)
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        self._ckptr.save(path, state, force=True)
        meta = {"step": step, "metrics": metrics or {}}
        with open(self.directory / f"{keep_tag}.json", "w") as f:
            json.dump(meta, f, default=str)
        if keep_last is not None and keep_last > 0:
            # retention: a 50-epoch x 5-fold run would otherwise keep every
            # per-epoch state on disk; resume only ever needs the newest
            import shutil

            for old in self._step_numbers()[:-keep_last]:
                shutil.rmtree(self.step_path(old), ignore_errors=True)
        return path

    def save_best(self, params: Any, metrics: Optional[Dict[str, Any]] = None) -> Path:
        path = self.directory / "best"
        self._ckptr.save(path, {"params": params}, force=True)
        with open(self.directory / "best.json", "w") as f:
            json.dump({"metrics": metrics or {}}, f, default=str)
        return path

    def restore(
        self,
        step: Optional[int] = None,
        tag: str = "latest",
        target: Optional[Any] = None,
    ) -> Dict[str, Any]:
        """Restore a step; pass ``target`` (a matching pytree, e.g. the live
        (params, opt_state) state) to recover exact container types —
        orbax otherwise returns plain dicts for NamedTuple optimizer states.
        """
        if step is None:
            with open(self.directory / f"{tag}.json") as f:
                step = json.load(f)["step"]
        path = self.step_path(step)
        if target is not None:
            restored = self._ckptr.restore(path, item=target)
        else:
            restored = self._ckptr.restore(path)
        restored["step"] = step
        return restored

    def restore_best(self) -> Any:
        return self._ckptr.restore(self.directory / "best")["params"]

    def latest_step(self) -> Optional[int]:
        steps = self._step_numbers()
        return steps[-1] if steps else None
