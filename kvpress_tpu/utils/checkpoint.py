"""Orbax checkpointing for converted model params (SURVEY §5: the reference
keeps weights on the HF hub; here HF→JAX conversion is paid once and the
stacked pytree round-trips through orbax for fast reload)."""

from __future__ import annotations

import os


def save_params(path: str, params: dict) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, params)
        ckpt.wait_until_finished()


def load_params(path: str) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(path)
