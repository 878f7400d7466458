"""HD3 activation parity: Flax HD3Net + generic converter vs the reference
torch implementation (CUDA correlation and torch-1.1 integer-division
semantics patched with exact oracles)."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)
if REF not in sys.path:
    sys.path.insert(0, REF)


def torch_correlation_d4(tensorFirst, tensorSecond):
    """±4-window stride-1 correlation oracle (hd3 correlation.py semantics)."""
    d = 4
    f2p = torch.nn.functional.pad(tensorSecond, (d, d, d, d))
    b, c, h, w = tensorFirst.shape
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            f2s = f2p[:, :, d + dy : d + dy + h, d + dx : d + dx + w]
            outs.append((tensorFirst * f2s).mean(dim=1))
    return torch.stack(outs, dim=1)


def _prob2cornerflow_v11(prob, normalize=True):
    """torch-1.1 semantics of hd3_ops._prob2cornerflow (integer division on
    long tensors; torch 2.x turns `/` into true division and breaks the
    reference code as checked in)."""
    import math

    if normalize:
        prob = torch.nn.functional.softmax(prob, dim=1)
    B, C, H, W = prob.size()
    d = int(math.sqrt(C))
    pr = prob.reshape(B, d, d, -1).permute(0, 3, 1, 2)
    avg = torch.nn.functional.avg_pool2d(pr, 2, 1, 0)
    out, indice = torch.nn.functional.max_pool2d(
        avg, d - 1, 1, return_indices=True
    )
    indice = indice + torch.div(indice, d - 1, rounding_mode="floor")
    indice = indice.reshape(B, H, W).unsqueeze(1)

    def indice2flow(ind):
        return torch.cat(
            [
                ind % d - d // 2,
                torch.div(ind, d, rounding_mode="floor") - d // 2,
            ],
            1,
        ).float()

    corners = [0, 1, d, d + 1]
    cor_prob = [torch.gather(prob, 1, indice + o) for o in corners]
    cor_flow = [indice2flow(indice + o) for o in corners]
    return cor_prob, cor_flow


@pytest.fixture(scope="module")
def torch_hd3():
    fake_corr = types.ModuleType(
        "libs.deep_models.flow.hd3.models.correlation"
    )
    fake_corr.FunctionCorrelation = torch_correlation_d4
    sys.modules["libs.deep_models.flow.hd3.models.correlation"] = fake_corr

    import importlib

    hd3_ops = importlib.import_module(
        "libs.deep_models.flow.hd3.models.hd3_ops"
    )
    hd3_ops._prob2cornerflow = _prob2cornerflow_v11
    hd3net_mod = importlib.import_module(
        "libs.deep_models.flow.hd3.models.hd3net"
    )
    # hd3net imported hd3_ops symbols with *; refresh the patched ones
    hd3net_mod.density2vector = hd3_ops.density2vector
    return hd3net_mod


def _randomize_bn(model, seed):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3, generator=g)
            m.running_var.uniform_(0.7, 1.3, generator=g)


class TestHD3Parity:
    @pytest.mark.parametrize("task", ["flow", "stereo"])
    def test_full_network_matches(self, torch_hd3, task):
        from dfvo_tpu.models.convert import convert_hd3
        from dfvo_tpu.models.hd3 import HD3Net

        torch.manual_seed(0)
        corr_range = [4, 4, 4, 4, 4]
        tnet = torch_hd3.HD3Net(
            task, "dlaup", "hda", corr_range, context=False, ds=6
        )
        _randomize_bn(tnet, 1)
        tnet.eval()

        variables = convert_hd3(tnet.state_dict())

        rng = np.random.RandomState(2)
        h, w = 64, 128
        img1 = rng.rand(1, 3, h, w).astype(np.float32)
        img2 = np.clip(
            img1 + rng.randn(1, 3, h, w).astype(np.float32) * 0.05, 0, 1
        )
        with torch.no_grad():
            t_prob, t_vect = tnet(
                torch.cat(
                    [torch.from_numpy(img1), torch.from_numpy(img2)], 1
                )
            )

        net = HD3Net(task=task, encoder="dlaup", decoder="hda",
                     corr_range=tuple(corr_range), context=False, ds=6)
        j_prob, j_vect = jax.jit(net.apply)(
            variables,
            jnp.array(img1.transpose(0, 2, 3, 1)),
            jnp.array(img2.transpose(0, 2, 3, 1)),
        )
        assert len(j_vect) == len(t_vect)
        for lvl, (jv, tv) in enumerate(zip(j_vect, t_vect)):
            t = tv.numpy().transpose(0, 2, 3, 1)
            j = np.asarray(jv)
            assert j.shape == t.shape
            np.testing.assert_allclose(
                j, t, atol=2e-3,
                err_msg=f"task={task} level {lvl} vect mismatch",
            )
