"""Checkpoint / resume via orbax.

Replaces PL's `ModelCheckpoint` + `resume_from_checkpoint` (`main.py:133-138,
173-183`) and the warm-start `load_pretrained` (`modules/exp.py:132-147`,
`exp_merge_mean_teacher.py:229-244`). Stage-2 state captures everything the
reference keeps implicitly: student+teacher params & BN stats, optimizer
state, the learnable threshold tau, the novel feature queue, step and PRNG key
(SURVEY §5.4).
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int | None = None,
                 save_interval_steps: int = 1):
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, save_interval_steps=save_interval_steps
        )
        self._mgr = ocp.CheckpointManager(os.path.abspath(directory), options=options)

    def save(self, step: int, state) -> bool:
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        return saved

    def restore(self, state_template, step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def save_pretrained(directory: str, params) -> None:
    """Save bare params (the Stage-1 -> Stage-2 handoff artifact; analog of
    `PretrainCheckpointCallback`'s raw state_dict)."""
    ckptr = ocp.StandardCheckpointer()
    # force: a resumed (or repeated) run re-saves the handoff artifact at the
    # end; orbax otherwise refuses to overwrite the existing directory
    ckptr.save(os.path.join(os.path.abspath(directory), "pretrained"), params,
               force=True)
    ckptr.wait_until_finished()


def load_pretrained(directory: str, params_template):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(
        os.path.join(os.path.abspath(directory), "pretrained"), params_template
    )
