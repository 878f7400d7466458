"""Activation-parity tests: Flax networks + weight converter vs the
reference torch implementations (imported read-only from /root/reference,
with CUDA-only pieces patched to CPU equivalents).

These are the "numerical parity tests of JAX network ports vs reference
activations on fixed inputs" called for in SURVEY.md §4.
"""

import os
import sys

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


def torch_correlation(first, second, stride):
    """Pure-torch oracle of the reference CUDA correlation kernel
    (lite_flow_net/correlation.py:38-105): zero-padded ±3 window, channel
    mean, output subsampled by stride."""
    b, c, h, w = first.shape
    d = 3
    pad = d * stride
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    f2p = torch.nn.functional.pad(second, (pad, pad, pad, pad))
    outs = []
    f1s = first[:, :, ::stride, ::stride]
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            y0 = pad + dy * stride
            x0 = pad + dx * stride
            f2s = f2p[:, :, y0 : y0 + h : stride, x0 : x0 + w : stride]
            outs.append((f1s * f2s).mean(dim=1))
    return torch.stack(outs, dim=1)  # [B, 49, H', W'] dy-major


class TestCorrelation:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_xla_matches_torch_oracle(self, stride):
        from dfvo_tpu.ops.correlation import correlation_xla

        rng = np.random.RandomState(0)
        f1 = rng.randn(2, 32, 11, 13).astype(np.float32)
        f2 = rng.randn(2, 32, 11, 13).astype(np.float32)
        ours = correlation_xla(
            jnp.array(f1.transpose(0, 2, 3, 1)),
            jnp.array(f2.transpose(0, 2, 3, 1)),
            max_disp=3,
            stride=stride,
        )
        oracle = torch_correlation(
            torch.from_numpy(f1), torch.from_numpy(f2), stride
        ).numpy()
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), oracle, atol=1e-5
        )

    def test_pallas_interpret_matches_xla(self):
        from dfvo_tpu.ops.correlation import correlation_xla
        from dfvo_tpu.ops.pallas_corr import correlation_pallas
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.RandomState(1)
        f1 = jnp.array(rng.randn(1, 8, 16, 32).astype(np.float32))
        f2 = jnp.array(rng.randn(1, 8, 16, 32).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            out_p = correlation_pallas(f1, f2, 3, 1)
        out_x = correlation_xla(f1, f2, 3, 1)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)

    def test_pallas_rowchunk_matches_xla(self):
        """Row-banded halo-DMA kernel (oversized shapes; VERDICT r1 item 3),
        including a row count not divisible by the band."""
        from dfvo_tpu.ops.correlation import correlation_xla
        from dfvo_tpu.ops.pallas_corr import _pallas_corr_rowchunk
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.RandomState(3)
        for (n, h, w, c, d, band) in [
            (2, 48, 40, 16, 3, 16),
            (1, 13, 24, 8, 3, 4),  # 13 rows, band 4: padded tail band
            (1, 10, 24, 8, 4, 4),  # HD3 window
            (1, 12, 30, 8, 3, 8),  # width not a multiple of 8
        ]:
            f1 = jnp.array(rng.randn(n, h, w, c).astype(np.float32))
            f2 = jnp.array(rng.randn(n, h, w, c).astype(np.float32))
            with pltpu.force_tpu_interpret_mode():
                out_p = _pallas_corr_rowchunk(f1, f2, d, band)
            out_x = correlation_xla(f1, f2, max_disp=d, stride=1)
            np.testing.assert_allclose(
                np.asarray(out_p), np.asarray(out_x), atol=1e-5
            )

    def test_gradients_flow(self):
        from dfvo_tpu.ops.correlation import correlation_xla

        rng = np.random.RandomState(2)
        f1 = jnp.array(rng.randn(1, 6, 7, 8).astype(np.float32))
        f2 = jnp.array(rng.randn(1, 6, 7, 8).astype(np.float32))
        g1, g2 = jax.grad(
            lambda a, b: jnp.sum(correlation_xla(a, b) ** 2), argnums=(0, 1)
        )(f1, f2)
        assert np.isfinite(np.asarray(g1)).all()
        assert np.abs(np.asarray(g2)).max() > 0


def _torch_resnet18_encoder(seed=0):
    """Minimal torch ResNet-18 with torchvision-compatible state_dict keys
    (torchvision isn't installed; this mirrors its BasicBlock graph)."""
    tnn = torch.nn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idn)

    class Enc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(
                BasicBlock(64, 64, 1), BasicBlock(64, 64, 1)
            )
            self.layer2 = tnn.Sequential(
                BasicBlock(64, 128, 2), BasicBlock(128, 128, 1)
            )
            self.layer3 = tnn.Sequential(
                BasicBlock(128, 256, 2), BasicBlock(256, 256, 1)
            )
            self.layer4 = tnn.Sequential(
                BasicBlock(256, 512, 2), BasicBlock(512, 512, 1)
            )

        def forward(self, x):
            x = (x - 0.45) / 0.225
            feats = [torch.relu(self.bn1(self.conv1(x)))]
            feats.append(self.layer1(self.maxpool(feats[-1])))
            feats.append(self.layer2(feats[-1]))
            feats.append(self.layer3(feats[-1]))
            feats.append(self.layer4(feats[-1]))
            return feats

    torch.manual_seed(seed)
    enc = Enc()
    # randomize BN running stats so conversion of them is actually tested
    for m in enc.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    enc.eval()
    return enc


class TestResnetEncoderParity:
    def test_activations_match(self):
        from dfvo_tpu.models import ResnetEncoder
        from dfvo_tpu.models.convert import convert_resnet_encoder

        enc = _torch_resnet18_encoder()
        sd = enc.state_dict()
        params, stats = convert_resnet_encoder(sd, prefix="")

        rng = np.random.RandomState(3)
        img = rng.rand(1, 64, 96, 3).astype(np.float32)
        with torch.no_grad():
            t_feats = enc(torch.from_numpy(img.transpose(0, 3, 1, 2)))

        model = ResnetEncoder(18)
        j_feats = model.apply(
            {"params": params, "batch_stats": stats}, jnp.array(img)
        )
        assert len(j_feats) == 5
        for tf, jf in zip(t_feats, j_feats):
            np.testing.assert_allclose(
                np.asarray(jf),
                tf.numpy().transpose(0, 2, 3, 1),
                atol=2e-4,
            )


class TestDepthDecoderParity:
    def test_activations_match(self):
        from libs.deep_models.depth.monodepth2.depth_decoder import (
            DepthDecoder as TorchDepthDecoder,
        )

        from dfvo_tpu.models import DepthDecoder
        from dfvo_tpu.models.convert import convert_depth_decoder

        torch.manual_seed(1)
        tdec = TorchDepthDecoder(
            num_ch_enc=np.array([64, 64, 128, 256, 512]), scales=range(4)
        )
        tdec.eval()
        params = convert_depth_decoder(tdec.state_dict())

        rng = np.random.RandomState(4)
        h, w = 64, 96
        feats_np = [
            rng.randn(1, c, h // f, w // f).astype(np.float32)
            for c, f in zip([64, 64, 128, 256, 512], [2, 4, 8, 16, 32])
        ]
        with torch.no_grad():
            t_out = tdec([torch.from_numpy(f) for f in feats_np])

        model = DepthDecoder()
        j_out = model.apply(
            {"params": params},
            [jnp.array(f.transpose(0, 2, 3, 1)) for f in feats_np],
        )
        for s in range(4):
            np.testing.assert_allclose(
                np.asarray(j_out[s]),
                t_out[("disp", s)].numpy().transpose(0, 2, 3, 1),
                atol=1e-5,
            )


class TestPoseDecoderParity:
    def test_activations_match(self):
        from libs.deep_models.pose.monodepth2.pose_decoder import (
            PoseDecoder as TorchPoseDecoder,
        )

        from dfvo_tpu.models import PoseDecoder
        from dfvo_tpu.models.convert import convert_pose_decoder

        torch.manual_seed(2)
        tdec = TorchPoseDecoder(
            np.array([64, 64, 128, 256, 512]), 1, 2
        )
        tdec.eval()
        params = convert_pose_decoder(tdec.state_dict())

        rng = np.random.RandomState(5)
        feat = rng.randn(1, 512, 2, 3).astype(np.float32)
        with torch.no_grad():
            t_aa, t_tr = tdec([[torch.from_numpy(feat)]])

        model = PoseDecoder()
        j_aa, j_tr = model.apply(
            {"params": params}, [jnp.array(feat.transpose(0, 2, 3, 1))]
        )
        np.testing.assert_allclose(np.asarray(j_aa), t_aa.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(j_tr), t_tr.numpy(), atol=1e-6)


def _import_reference_liteflownet():
    """Import the reference LiteFlowNet with its CUDA-only pieces (cupy
    correlation, .cuda() warping grid) replaced by CPU equivalents."""
    import types

    fake_corr = types.ModuleType(
        "libs.deep_models.flow.lite_flow_net.correlation"
    )
    fake_corr.FunctionCorrelation = (
        lambda tensorFirst, tensorSecond, intStride: torch_correlation(
            tensorFirst, tensorSecond, intStride
        )
    )
    sys.modules["libs.deep_models.flow.lite_flow_net.correlation"] = fake_corr

    import importlib

    lfn = importlib.import_module(
        "libs.deep_models.flow.lite_flow_net.lite_flow_net"
    )

    grids = {}

    def cpu_backward(tensorInput, tensorFlow):
        key = str(tensorFlow.size())
        if key not in grids:
            th = torch.linspace(-1.0, 1.0, tensorFlow.size(3)).view(
                1, 1, 1, tensorFlow.size(3)
            ).expand(tensorFlow.size(0), -1, tensorFlow.size(2), -1)
            tv = torch.linspace(-1.0, 1.0, tensorFlow.size(2)).view(
                1, 1, tensorFlow.size(2), 1
            ).expand(tensorFlow.size(0), -1, -1, tensorFlow.size(3))
            grids[key] = torch.cat([th, tv], 1)
        flow = torch.cat(
            [
                tensorFlow[:, 0:1] / ((tensorInput.size(3) - 1.0) / 2.0),
                tensorFlow[:, 1:2] / ((tensorInput.size(2) - 1.0) / 2.0),
            ],
            1,
        )
        return torch.nn.functional.grid_sample(
            tensorInput,
            (grids[key] + flow).permute(0, 2, 3, 1),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )

    lfn.Backward = cpu_backward
    return lfn


class TestLiteFlowNetParity:
    def test_full_network_matches(self):
        lfn_mod = _import_reference_liteflownet()
        torch.manual_seed(3)
        tnet = lfn_mod.LiteFlowNet()
        tnet.eval()

        from dfvo_tpu.models import LiteFlowNet
        from dfvo_tpu.models.convert import convert_liteflownet

        variables = convert_liteflownet(tnet.state_dict())

        rng = np.random.RandomState(6)
        h, w = 64, 96  # divisible by 32
        img1 = rng.rand(1, 3, h, w).astype(np.float32)
        img2 = np.clip(
            img1 + rng.randn(1, 3, h, w).astype(np.float32) * 0.05, 0, 1
        )
        with torch.no_grad():
            t_flows = tnet([torch.from_numpy(img1), torch.from_numpy(img2)])

        model = LiteFlowNet(use_pallas=False)
        # jit: eager per-op dispatch of the full net costs minutes on the
        # single-core CI host
        j_flows = jax.jit(model.apply)(
            variables,
            jnp.array(img1.transpose(0, 2, 3, 1)),
            jnp.array(img2.transpose(0, 2, 3, 1)),
        )
        assert set(j_flows) == set(t_flows)
        for s in sorted(t_flows):
            t = t_flows[s].numpy().transpose(0, 2, 3, 1)
            j = np.asarray(j_flows[s])
            assert j.shape == t.shape
            np.testing.assert_allclose(j, t, atol=5e-4)
