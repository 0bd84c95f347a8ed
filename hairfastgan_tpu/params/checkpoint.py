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


def _static_sidecar(path: Path) -> Path:
    return Path(f"{Path(path).absolute()}_static.pkl")


def _iter_statics(tree, prefix=()):
    """Yield (path, value) for every Static config node in a plain pytree."""
    from hairfastgan_tpu.models.layers import Static

    if isinstance(tree, Static):
        yield prefix, tree.value
    elif isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_statics(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_statics(v, prefix + (i,))


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def save_pytree(path: Path, tree: Any, strip: Sequence[str] = ()) -> None:
    """Save a parameter pytree; `strip` drops frozen sub-trees (e.g. 'clip').

    `Static` config nodes (models/layers.Static) are register_static — orbax
    stores them as empty subtrees — so their values go into a pickle sidecar
    next to the checkpoint directory and are re-attached by restore_pytree.
    """
    import pickle

    if strip:
        tree = {k: v for k, v in tree.items() if k not in strip} \
            if isinstance(tree, dict) else tree
    _checkpointer().save(Path(path).absolute(), tree, force=True)
    statics = dict(_iter_statics(tree))
    side = _static_sidecar(path)
    if statics:
        side.write_bytes(pickle.dumps(statics))
    elif side.exists():
        side.unlink()


def restore_pytree(path: Path, like: Optional[Any] = None) -> Any:
    import pickle

    import orbax.checkpoint as ocp

    from hairfastgan_tpu.models.layers import Static

    ckptr = _checkpointer()
    if like is not None:
        tree = ckptr.restore(Path(path).absolute(),
                             restore_args=ocp.checkpoint_utils.construct_restore_args(like))
    else:
        tree = ckptr.restore(Path(path).absolute())
    side = _static_sidecar(path)
    if side.exists():
        for p, value in pickle.loads(side.read_bytes()).items():
            _set_path(tree, p, Static(value))
    return tree


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
