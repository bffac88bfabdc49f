"""kgforge/tuning.py — shared DataContext knobs and the env opt-out."""

from __future__ import annotations

import os

from kgforge.tuning import tune_data_context


def _ctx():
    from ray.data import DataContext

    return DataContext.get_current()


def test_tune_disables_op_reservation_by_default(ray_session, monkeypatch):
    monkeypatch.delenv("KGFORGE_OP_RESERVATION", raising=False)
    ctx = _ctx()
    prev = ctx.op_resource_reservation_enabled
    try:
        ctx.op_resource_reservation_enabled = True
        tune_data_context(4)
        assert ctx.op_resource_reservation_enabled is False
        assert ctx.read_op_min_num_blocks == 8  # max(8, ncpu)
        assert ctx.max_hash_shuffle_aggregators == 2
    finally:
        ctx.op_resource_reservation_enabled = prev


def test_tune_env_opt_out_restores_ray_default(ray_session, monkeypatch):
    monkeypatch.setenv("KGFORGE_OP_RESERVATION", "1")
    ctx = _ctx()
    prev = ctx.op_resource_reservation_enabled
    try:
        ctx.op_resource_reservation_enabled = True
        tune_data_context(16)
        # opt-out: the reservation policy is left exactly as Ray set it
        assert ctx.op_resource_reservation_enabled is True
        assert ctx.read_op_min_num_blocks == 16
        assert ctx.max_hash_shuffle_aggregators == 4
    finally:
        ctx.op_resource_reservation_enabled = prev


def test_tune_infers_cpus_from_live_session(ray_session, monkeypatch):
    monkeypatch.delenv("KGFORGE_OP_RESERVATION", raising=False)
    ctx = _ctx()
    prev = ctx.op_resource_reservation_enabled
    try:
        tune_data_context()  # session fixture runs at num_cpus=4
        assert ctx.read_op_min_num_blocks == 8
    finally:
        ctx.op_resource_reservation_enabled = prev
