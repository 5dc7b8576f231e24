"""Parallelism tests on the virtual 8-device CPU mesh: mesh/sharding
construction, tensor-parallel rules, and the sequence-parallel primitives."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from autovc_tpu.models import LSTM
from autovc_tpu.parallel import make_mesh, param_shardings
from autovc_tpu.parallel.sequence import halo_conv1d, sp_blstm, sp_lstm


@pytest.fixture(scope="module")
def seq_mesh():
    devs = np.asarray(jax.devices()[:4])
    return Mesh(devs, ("seq",))


def test_make_mesh_shapes():
    m = make_mesh(data=4, model=2)
    assert m.shape == {"data": 4, "model": 2}
    m = make_mesh(model=2)  # data=-1 -> all remaining
    assert m.shape["data"] * 2 == len(jax.devices())


def test_param_shardings_tp_rules():
    m = make_mesh(data=4, model=2)
    params = {
        "conv0": {"Conv_0": {"kernel": jnp.zeros((5, 336, 512)), "bias": jnp.zeros((512,))}},
        "blstm": {"w_ih_l0_fwd": jnp.zeros((512, 128)), "b_l0_fwd": jnp.zeros((128,))},
        "small": {"kernel": jnp.zeros((3, 3))},
    }
    sh = param_shardings(params, m, tensor_parallel=True)
    assert "model" in str(sh["conv0"]["Conv_0"]["kernel"].spec)
    assert "model" in str(sh["blstm"]["w_ih_l0_fwd"].spec)
    # non-matching / non-divisible stays replicated
    assert sh["small"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_halo_conv1d_matches_dense(seq_mesh):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 16), jnp.float32)  # 64 = 4 chunks of 16
    kernel = jnp.asarray(rng.randn(5, 16, 8), jnp.float32) * 0.1
    bias = jnp.asarray(rng.randn(8), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, kernel, (1,), [(2, 2)], dimension_numbers=("NHC", "HIO", "NHC")
    ) + bias
    out = halo_conv1d(x, kernel, bias, seq_mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_halo_conv1d_kernel_size_one(seq_mesh):
    """k=1 means halo=0: the edge slice x[:, -0:] would grab the WHOLE chunk
    and double the output length (regression — ConvNorm's default kernel
    size is 1, so SP users hit this with plain pointwise convs)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 16), jnp.float32)
    kernel = jnp.asarray(rng.randn(1, 16, 8), jnp.float32) * 0.1
    bias = jnp.asarray(rng.randn(8), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, kernel, (1,), [(0, 0)], dimension_numbers=("NHC", "HIO", "NHC")
    ) + bias
    out = halo_conv1d(x, kernel, bias, seq_mesh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_sp_lstm_matches_single_device(seq_mesh, reverse):
    rng = np.random.RandomState(1)
    b, t, cin, h = 2, 32, 12, 8
    x = jnp.asarray(rng.randn(b, t, cin), jnp.float32)
    w_ih = jnp.asarray(rng.randn(cin, 4 * h) * 0.2, jnp.float32)
    w_hh = jnp.asarray(rng.randn(h, 4 * h) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.randn(4 * h) * 0.1, jnp.float32)

    # dense reference: same recurrence on one device
    from autovc_tpu.parallel.sequence import _lstm_chunk_scan

    _, ref = _lstm_chunk_scan(x @ w_ih + bias, w_hh, jnp.zeros((b, h)), jnp.zeros((b, h)), reverse)
    out = sp_lstm(x, w_ih, w_hh, bias, seq_mesh, reverse=reverse)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sp_blstm_matches_layers_lstm(seq_mesh):
    """Sequence-parallel BLSTM == the models.layers.LSTM single-device stack
    with the same parameters."""
    rng = np.random.RandomState(2)
    b, t, cin, h = 1, 32, 10, 6
    x = jnp.asarray(rng.randn(b, t, cin), jnp.float32)

    model = LSTM(hidden=h, num_layers=2, bidirectional=True)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)

    out = sp_blstm(x, variables["params"], seq_mesh, num_layers=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sp_generator_matches_dense(seq_mesh):
    """Full sequence-parallel Generator forward == the dense Generator in
    eval mode, on a 4-device time-sharded mesh."""
    from autovc_tpu.config import ModelConfig
    from autovc_tpu.convert.sequence_parallel import SPGenerator
    from autovc_tpu.models import build_generator

    cfg = ModelConfig(model_type="spmel")
    model = build_generator(cfg)
    rng = np.random.RandomState(3)
    t = 4 * 2 * 32  # 4 chunks x 2 freq-blocks
    x = jnp.asarray(rng.rand(1, t, 80), jnp.float32)
    c_org = jnp.asarray(rng.randn(1, 256), jnp.float32)
    c_trg = jnp.asarray(rng.randn(1, 256), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), x, c_org, c_trg, train=False)
    ref_id, ref_psnt, ref_codes = model.apply(variables, x, c_org, c_trg, train=False)

    sp = SPGenerator(
        variables["params"], variables.get("batch_stats", {}), cfg, seq_mesh
    )
    out_id, out_psnt, out_codes = sp(x, c_org, c_trg)
    np.testing.assert_allclose(np.asarray(out_codes), np.asarray(ref_codes), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(ref_id), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_psnt), np.asarray(ref_psnt), atol=2e-3)


def test_sp_generator_dp_combined_matches_dense():
    """Combined data x sequence parallelism: batch sharded over a 'data'
    axis AND time sharded over 'seq' on a 2x4 mesh must equal the dense
    Generator — DP composes with the halo/ring primitives because every
    'seq' collective runs within its data-parallel slice (VERDICT r3 §6)."""
    from autovc_tpu.config import ModelConfig
    from autovc_tpu.convert.sequence_parallel import SPGenerator
    from autovc_tpu.models import build_generator

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))

    cfg = ModelConfig(model_type="spmel")
    model = build_generator(cfg)
    rng = np.random.RandomState(7)
    t = 4 * 2 * 32
    x = jnp.asarray(rng.rand(2, t, 80), jnp.float32)  # batch 2 over 'data'
    c_org = jnp.asarray(rng.randn(2, 256), jnp.float32)
    c_trg = jnp.asarray(rng.randn(2, 256), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), x, c_org, c_trg, train=False)
    ref_id, ref_psnt, ref_codes = model.apply(variables, x, c_org, c_trg, train=False)

    sp = SPGenerator(
        variables["params"], variables.get("batch_stats", {}), cfg, mesh,
        batch_axis="data",
    )
    out_id, out_psnt, out_codes = sp(x, c_org, c_trg)
    np.testing.assert_allclose(np.asarray(out_codes), np.asarray(ref_codes), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(ref_id), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_psnt), np.asarray(ref_psnt), atol=2e-3)


def test_put_global_batch_single_process():
    from autovc_tpu.parallel import batch_sharding, make_mesh
    from autovc_tpu.parallel.mesh import put_global_batch

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    out = put_global_batch(x, batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(out), x)
    assert out.sharding.spec == jax.sharding.PartitionSpec("data")
