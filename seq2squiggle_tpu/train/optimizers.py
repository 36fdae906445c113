"""Optimizers and LR schedules (reference configure_optimizers,
src/seq2squiggle/model.py:309-385): Adam/AdamW/RAdam/AdaFactor/SGD/RMSProp,
warmup_cosine / warmup_constant / constant / warmup_cosine_restarts /
one_cycle, plus global-norm gradient clipping, built on optax."""

from __future__ import annotations

import logging

import optax

logger = logging.getLogger("seq2squiggle_tpu")


def build_schedule(config: dict, total_steps: int):
    lr = float(config["lr"])
    warmup = int(total_steps * float(config["warmup_ratio"]))
    name = config["lr_schedule"]
    total_steps = max(total_steps, warmup + 1)

    if name == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=total_steps, end_value=0.0,
        )
    if name == "warmup_constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(warmup, 1)),
             optax.constant_schedule(lr)],
            [max(warmup, 1)],
        )
    if name == "constant":
        return optax.constant_schedule(lr)
    if name == "warmup_cosine_restarts":
        # two hard-restart cosine cycles after warmup (num_cycles=2,
        # model.py:369-377)
        cycle = max((total_steps - warmup) // 2, 1)
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, max(warmup, 1)),
                optax.cosine_decay_schedule(lr, cycle),
                optax.cosine_decay_schedule(lr, cycle),
            ],
            [max(warmup, 1), max(warmup, 1) + cycle],
        )
    if name == "one_cycle":
        return optax.cosine_onecycle_schedule(total_steps, lr)
    raise ValueError(f"Unknown lr_schedule: {name}")


def build_optimizer(config: dict, total_steps: int) -> optax.GradientTransformation:
    schedule = build_schedule(config, total_steps)
    wd = float(config.get("weight_decay", 0.0))
    name = config["optimizer"]

    if name == "Adam":
        # torch Adam applies weight decay as L2 on the gradient
        opt = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(schedule, eps=1e-7),
        )
    elif name == "AdamW":
        opt = optax.adamw(schedule, eps=1e-7, weight_decay=wd)
    elif name == "RAdam":
        opt = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.radam(schedule),
        )
    elif name == "AdaFactor":
        opt = optax.adafactor(schedule)
    elif name == "SGD":
        opt = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(schedule),
        )
    elif name == "RMSProp":
        opt = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.rmsprop(schedule),
        )
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    clip = float(config.get("gradient_clip_val") or 0.0)
    if clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt
