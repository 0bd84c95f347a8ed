"""Orbax-based checkpoint save/restore for zoo params and training state.

Replaces the reference's ad-hoc torch.save dicts (SURVEY.md §5.4): training
scripts write {'model_state_dict': ...} (+ 'D', 'cur_iter' for PP) into
W&B dirs (scripts/*_train.py save_model); here everything is an orbax
checkpoint of a pytree. The reference's CLIP-stripping on save
(blending_train.py:77-87) is mirrored by `strip` keys.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_pytree(path: Path, tree: Any, strip: Sequence[str] = ()) -> None:
    """Save a parameter pytree; `strip` drops frozen sub-trees (e.g. 'clip')."""
    if strip:
        tree = {k: v for k, v in tree.items() if k not in strip} \
            if isinstance(tree, dict) else tree
    _checkpointer().save(Path(path).absolute(), tree, force=True)


def restore_pytree(path: Path, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    if like is not None:
        return ckptr.restore(Path(path).absolute(),
                             restore_args=ocp.checkpoint_utils.construct_restore_args(like))
    return ckptr.restore(Path(path).absolute())


def save_train_state(path: Path, params: Any, opt_state: Any, step: int,
                     disc_params: Any = None, strip: Sequence[str] = ("clip",)) -> None:
    """Training checkpoint incl. optimizer + step (pp_train.py:100-112 keeps
    'cur_iter' and the discriminator; generalized here)."""
    tree = {"params": ({k: v for k, v in params.items() if k not in strip}
                       if isinstance(params, dict) else params),
            "opt_state": opt_state,
            "step": step}
    if disc_params is not None:
        tree["disc"] = disc_params
    save_pytree(path, tree)


def restore_train_state(path: Path) -> Dict[str, Any]:
    return restore_pytree(path)
