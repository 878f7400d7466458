"""Geometry op tests: parity vs torch.grid_sample / cv2.triangulatePoints and
closed-form cases."""

import numpy as np
import pytest

import jax.numpy as jnp

from dfvo_tpu.geometry import lie
from dfvo_tpu.geometry.ops import (
    backproject_depth,
    project_points,
    reproject,
    rigid_flow,
    scatter_kp_depth,
    triangulate_depths,
    unproject_kp,
)
from dfvo_tpu.ops.warp import (
    coords_grid,
    flow_to_coords,
    grid_sample,
    warp_image_by_flow,
)


def _rand_K():
    return np.array([[370.0, 0, 320.0], [0, 371.0, 96.0], [0, 0, 1.0]])


class TestGridSample:
    @pytest.mark.parametrize("padding", ["zeros", "border"])
    def test_matches_torch_grid_sample(self, padding):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        n, h, w, c = 2, 12, 17, 3
        src = rng.randn(n, h, w, c).astype(np.float32)
        # random sample coords, including out-of-bounds
        coords = rng.uniform(-3, max(h, w) + 2, size=(n, 9, 11, 2)).astype(
            np.float32
        )
        out = np.asarray(grid_sample(jnp.array(src), jnp.array(coords), padding))

        # torch reference with align_corners=True (torch-1.1 semantics used
        # throughout the reference)
        norm = coords.copy()
        norm[..., 0] = coords[..., 0] / (w - 1) * 2 - 1
        norm[..., 1] = coords[..., 1] / (h - 1) * 2 - 1
        t_out = torch.nn.functional.grid_sample(
            torch.from_numpy(src).permute(0, 3, 1, 2),
            torch.from_numpy(norm),
            mode="bilinear",
            padding_mode=padding,
            align_corners=True,
        )
        t_out = t_out.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, t_out, atol=1e-5)

    def test_identity_flow_is_identity(self):
        rng = np.random.RandomState(1)
        img = jnp.array(rng.randn(1, 8, 9, 2).astype(np.float32))
        flow = jnp.zeros((1, 8, 9, 2), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(warp_image_by_flow(img, flow)), np.asarray(img), atol=1e-6
        )

    def test_integer_shift(self):
        img = jnp.arange(20, dtype=jnp.float32).reshape(1, 4, 5, 1)
        flow = jnp.ones((1, 4, 5, 2), jnp.float32) * jnp.array([1.0, 0.0])
        out = np.asarray(warp_image_by_flow(img, flow))[0, :, :, 0]
        expect = np.arange(20, dtype=np.float32).reshape(4, 5)
        np.testing.assert_allclose(out[:, :-1], expect[:, 1:], atol=1e-6)
        np.testing.assert_allclose(out[:, -1], 0.0)  # zeros padding


class TestLie:
    def test_so3_exp_log_roundtrip(self):
        rng = np.random.RandomState(2)
        w = jnp.array(rng.randn(16, 3).astype(np.float32) * 0.5)
        R = lie.so3_exp(w)
        # orthonormality
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), (16, 3, 3))
        np.testing.assert_allclose(
            np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(w), atol=1e-4)

    def test_so3_exp_matches_cv2_rodrigues(self):
        import cv2

        rng = np.random.RandomState(3)
        for _ in range(5):
            w = rng.randn(3) * 0.8
            R_cv, _ = cv2.Rodrigues(w)
            R = np.asarray(lie.so3_exp(jnp.array(w, dtype=jnp.float32)))
            np.testing.assert_allclose(R, R_cv, atol=1e-5)

    def test_se3_inverse(self):
        rng = np.random.RandomState(4)
        R = lie.so3_exp(jnp.array(rng.randn(3).astype(np.float32) * 0.3))
        T = lie.make_se3(R, jnp.array([1.0, -2.0, 0.5]))
        np.testing.assert_allclose(
            np.asarray(lie.se3_inverse(T) @ T), np.eye(4), atol=1e-5
        )

    def test_transformation_from_parameters_invert(self):
        aa = jnp.array([[0.1, -0.2, 0.05]])
        t = jnp.array([[0.3, 0.1, -1.0]])
        T = lie.transformation_from_parameters(aa, t)
        T_inv = lie.transformation_from_parameters(aa, t, invert=True)
        np.testing.assert_allclose(np.asarray(T @ T_inv), np.eye(4)[None], atol=1e-5)


class TestCameraOps:
    def test_backproject_project_roundtrip(self):
        K = jnp.array(_rand_K(), dtype=jnp.float32)
        inv_K = jnp.array(np.linalg.inv(_rand_K()), dtype=jnp.float32)
        depth = jnp.ones((1, 6, 8), jnp.float32) * 5.0
        pts = backproject_depth(depth, inv_K)
        pix = project_points(pts, K)
        np.testing.assert_allclose(
            np.asarray(pix[0]), np.asarray(coords_grid(6, 8)), atol=1e-3
        )

    def test_rigid_flow_translation(self):
        # camera translating right (+x) => scene points appear to move left
        K = jnp.array(_rand_K(), dtype=jnp.float32)
        inv_K = jnp.array(np.linalg.inv(_rand_K()), dtype=jnp.float32)
        depth = jnp.ones((1, 10, 12), jnp.float32) * 10.0
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -1.0  # transform of points into new camera frame
        flow = rigid_flow(depth, jnp.array(T)[None], K, inv_K)
        fx = _rand_K()[0, 0]
        np.testing.assert_allclose(
            np.asarray(flow[0, :, :, 0]), -fx / 10.0, atol=1e-3
        )
        np.testing.assert_allclose(np.asarray(flow[0, :, :, 1]), 0.0, atol=1e-3)

    def test_unproject_kp(self):
        K = _rand_K()
        kp = jnp.array([[320.0, 96.0], [400.0, 150.0]], dtype=jnp.float32)
        d = jnp.array([2.0, 4.0], jnp.float32)
        xyz = np.asarray(
            unproject_kp(kp, d, jnp.array(np.linalg.inv(K), dtype=jnp.float32))
        )
        # principal point unprojects to optical axis
        np.testing.assert_allclose(xyz[0], [0, 0, 2.0], atol=1e-4)
        # reproject second point
        pix = K @ xyz[1]
        np.testing.assert_allclose(pix[:2] / pix[2], [400.0, 150.0], atol=1e-3)

    def test_triangulation_matches_cv2(self):
        import cv2

        rng = np.random.RandomState(5)
        # synthetic scene: points in front of two cameras
        X = rng.uniform([-2, -1, 4], [2, 1, 12], size=(50, 3))
        T_1w = np.eye(4)
        R = np.asarray(lie.so3_exp(jnp.array([0.02, -0.05, 0.01], jnp.float32)))
        T_2w = np.eye(4)
        T_2w[:3, :3] = R
        T_2w[:3, 3] = [-0.5, 0.05, 0.1]

        def proj(T):
            Xc = (T[:3, :3] @ X.T + T[:3, 3:]).T
            return Xc[:, :2] / Xc[:, 2:]

        kp1, kp2 = proj(T_1w), proj(T_2w)
        X_cv = cv2.triangulatePoints(
            T_1w[:3].astype(np.float64),
            T_2w[:3].astype(np.float64),
            kp1.T.astype(np.float64),
            kp2.T.astype(np.float64),
        )
        X_cv = (X_cv[:3] / X_cv[3]).T

        X_ours, z1, z2 = triangulate_depths(
            jnp.array(kp1, jnp.float32),
            jnp.array(kp2, jnp.float32),
            jnp.array(T_1w, jnp.float32),
            jnp.array(T_2w, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(X_ours), X_cv, atol=1e-2)
        np.testing.assert_allclose(np.asarray(X_ours), X, atol=1e-2)
        assert np.all(np.asarray(z1) > 0) and np.all(np.asarray(z2) > 0)
        np.testing.assert_allclose(np.asarray(z1), X[:, 2], atol=1e-2)

    def test_scatter_kp_depth(self):
        kp = jnp.array([[1.2, 2.7], [-1.0, 0.0], [3.0, 1.0]], jnp.float32)
        d = jnp.array([5.0, 9.0, 7.0], jnp.float32)
        out = np.asarray(scatter_kp_depth(kp, d, 4, 5))
        assert out[2, 1] == 5.0  # floor(y)=2, floor(x)=1
        assert out[1, 3] == 7.0
        assert out.sum() == 12.0  # out-of-bounds dropped

    def test_reproject_identity(self):
        K = jnp.array(_rand_K(), dtype=jnp.float32)
        inv_K = jnp.array(np.linalg.inv(_rand_K()), dtype=jnp.float32)
        depth = jnp.ones((1, 5, 7), jnp.float32) * 3.0
        coords = reproject(depth, jnp.eye(4)[None], K, inv_K)
        np.testing.assert_allclose(
            np.asarray(coords[0]), np.asarray(coords_grid(5, 7)), atol=1e-3
        )


class TestGridSamplePacked:
    """The packed single-gather kernel must match the 4-gather oracle
    everywhere (round-2 warp optimization, see ops/warp.py)."""

    def test_patch4_matches_gather4_adversarial(self):
        from dfvo_tpu.ops.warp import _grid_sample_gather4, _grid_sample_patch4

        rng = np.random.RandomState(3)
        n, h, w, c = 2, 10, 13, 5
        src = jnp.array(rng.randn(n, h, w, c).astype(np.float32))
        # adversarial coords: interior, exact integers, all four borders,
        # just-outside, far-outside, exact corners
        special = np.array(
            [
                [3.25, 4.75], [5.0, 2.0], [0.0, 0.0], [w - 1.0, h - 1.0],
                [-0.5, 3.0], [w - 0.5, 3.0], [3.0, -0.5], [3.0, h - 0.5],
                [-1.0, -1.0], [w + 0.0, h + 0.0], [-7.3, 2.2], [50.0, 50.0],
                [w - 1.5, h - 1.5], [0.5, 0.5],
            ],
            np.float32,
        )
        coords = np.tile(special[None, :, None, :], (n, 1, 3, 1))
        coords += rng.uniform(-0.01, 0.01, coords.shape).astype(np.float32)
        coords = jnp.array(coords)
        a = np.asarray(_grid_sample_patch4(src, coords))
        b = np.asarray(_grid_sample_gather4(src, coords, "zeros"))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_patch4_random_dense(self):
        from dfvo_tpu.ops.warp import _grid_sample_gather4, _grid_sample_patch4

        rng = np.random.RandomState(4)
        n, h, w, c = 3, 24, 31, 8
        src = jnp.array(rng.randn(n, h, w, c).astype(np.float32))
        coords = jnp.array(
            rng.uniform(-4, max(h, w) + 3, size=(n, 20, 22, 2)).astype(
                np.float32
            )
        )
        a = np.asarray(_grid_sample_patch4(src, coords))
        b = np.asarray(_grid_sample_gather4(src, coords, "zeros"))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_patch4_gradient_flows(self):
        """Online finetuning differentiates through warps; the packed
        kernel's VJP (scatter-add through jnp.take) must be finite."""
        import jax

        from dfvo_tpu.ops.warp import warp_image_by_flow

        rng = np.random.RandomState(5)
        img = jnp.array(rng.randn(1, 8, 9, 2).astype(np.float32))
        flow = jnp.array(0.3 * rng.randn(1, 8, 9, 2).astype(np.float32))
        g_img, g_flow = jax.grad(
            lambda i, f: jnp.sum(warp_image_by_flow(i, f) ** 2), argnums=(0, 1)
        )(img, flow)
        assert np.isfinite(np.asarray(g_img)).all()
        assert np.isfinite(np.asarray(g_flow)).all()
        assert float(jnp.abs(g_img).sum()) > 0


class TestEnvGatedVariants:
    """Every env-gated numeric variant (perf probe levers) must be
    bit-identical to the default path — a silent mismatch would corrupt
    probe-driven flag flips (ADVICE r4). Flags are read at trace time, so
    plain (unjitted) calls see the monkeypatched values."""

    def _dense_case(self, seed=7, n=3, h=12, w=17, c=6):
        rng = np.random.RandomState(seed)
        src = jnp.array(rng.randn(n, h, w, c).astype(np.float32))
        coords = jnp.array(
            rng.uniform(-2, max(h, w) + 2, size=(n, h, w, 2)).astype(
                np.float32
            )
        )
        return src, coords

    @pytest.mark.parametrize("build", ["pre_t", "stack", "xonly"])
    def test_warp_build_variants_match_base(self, monkeypatch, build):
        from dfvo_tpu.ops.warp import _grid_sample_patch4

        src, coords = self._dense_case()
        monkeypatch.delenv("DFVO_WARP_BUILD", raising=False)
        base = np.asarray(_grid_sample_patch4(src, coords))
        monkeypatch.setenv("DFVO_WARP_BUILD", build)
        var = np.asarray(_grid_sample_patch4(src, coords))
        np.testing.assert_array_equal(base, var)

    @pytest.mark.parametrize("build", ["pre_t", "stack", "xonly"])
    def test_warp_smallc_build_variants_match_base(self, monkeypatch, build):
        """DFVO_WARP_BUILD_SMALLC routes only c<=4 dense warps (image/flow
        tables) to a build variant; must be bit-identical to base."""
        from dfvo_tpu.ops.warp import _grid_sample_patch4

        src, coords = self._dense_case(c=3)
        monkeypatch.delenv("DFVO_WARP_BUILD", raising=False)
        monkeypatch.delenv("DFVO_WARP_BUILD_SMALLC", raising=False)
        base = np.asarray(_grid_sample_patch4(src, coords))
        monkeypatch.setenv("DFVO_WARP_BUILD_SMALLC", build)
        var = np.asarray(_grid_sample_patch4(src, coords))
        np.testing.assert_array_equal(base, var)
        # wide warps must NOT be affected by the small-c flag
        src_w, coords_w = self._dense_case(c=6)
        np.testing.assert_array_equal(
            np.asarray(_grid_sample_patch4(src_w, coords_w)),
            np.asarray(_grid_sample_patch4(src_w, coords_w)),
        )

    def test_warp_smallc_unknown_value_raises(self, monkeypatch):
        from dfvo_tpu.ops.warp import _grid_sample_patch4

        src, coords = self._dense_case(seed=9, n=1, h=6, w=6, c=2)
        monkeypatch.setenv("DFVO_WARP_BUILD_SMALLC", "stck")  # typo'd probe
        with pytest.raises(ValueError, match="DFVO_WARP_BUILD_SMALLC"):
            _grid_sample_patch4(src, coords)

    def test_warp_src_barrier_matches_base(self, monkeypatch):
        from dfvo_tpu.ops.warp import _grid_sample_patch4

        src, coords = self._dense_case(seed=8)
        monkeypatch.delenv("DFVO_WARP_SRC_BARRIER", raising=False)
        base = np.asarray(_grid_sample_patch4(src, coords))
        monkeypatch.setenv("DFVO_WARP_SRC_BARRIER", "1")
        var = np.asarray(_grid_sample_patch4(src, coords))
        np.testing.assert_array_equal(base, var)

    def test_warp_build_unknown_value_raises(self, monkeypatch):
        from dfvo_tpu.ops.warp import _grid_sample_patch4

        src, coords = self._dense_case(seed=9, n=1, h=6, w=6, c=2)
        monkeypatch.setenv("DFVO_WARP_BUILD", "xpair")  # typo'd probe
        with pytest.raises(ValueError, match="DFVO_WARP_BUILD"):
            _grid_sample_patch4(src, coords)

    def test_deconv_elementwise_matches_conv(self, monkeypatch):
        import jax

        from dfvo_tpu.models.liteflownet import _DepthwiseDeconv2x

        rng = np.random.RandomState(11)
        x = jnp.array(rng.randn(2, 9, 13, 4).astype(np.float32))
        mod = _DepthwiseDeconv2x(4)
        params = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.delenv("DFVO_DECONV_EW", raising=False)
        base = np.asarray(mod.apply(params, x))
        monkeypatch.setenv("DFVO_DECONV_EW", "1")
        var = np.asarray(mod.apply(params, x))
        assert base.shape == (2, 18, 26, 4)
        np.testing.assert_allclose(base, var, atol=1e-6)

    @pytest.mark.parametrize("padc", ["8", "32"])
    def test_head_pad_matches_base(self, monkeypatch, padc):
        """DFVO_HEAD_PAD (runtime zero-padded Cout, a layout-anchor probe)
        must be bit-identical to the plain XLA head conv."""
        from dfvo_tpu.ops.headconv import _headconv_xla

        rng = np.random.RandomState(13)
        x = jnp.array(rng.randn(2, 10, 14, 8).astype(np.float32))
        k = jnp.array(rng.randn(3, 3, 8, 2).astype(np.float32))
        b = jnp.array(rng.randn(2).astype(np.float32))
        monkeypatch.delenv("DFVO_HEAD_PAD", raising=False)
        base = np.asarray(_headconv_xla(x, k, b, 1))
        monkeypatch.setenv("DFVO_HEAD_PAD", padc)
        var = np.asarray(_headconv_xla(x, k, b, 1))
        np.testing.assert_array_equal(base, var)

    def test_head_pad_unknown_value_raises(self, monkeypatch):
        from dfvo_tpu.ops.headconv import _headconv_xla

        x = jnp.zeros((1, 6, 6, 4), jnp.float32)
        k = jnp.zeros((3, 3, 4, 2), jnp.float32)
        b = jnp.zeros((2,), jnp.float32)
        monkeypatch.setenv("DFVO_HEAD_PAD", "7")  # typo'd probe
        with pytest.raises(ValueError, match="DFVO_HEAD_PAD"):
            _headconv_xla(x, k, b, 1)

    @pytest.mark.parametrize("padc", ["8", "16"])
    def test_deconv_pad_matches_base(self, monkeypatch, padc):
        """DFVO_DECONV_PAD (runtime zero-padded depthwise channels) must be
        bit-identical to the plain depthwise deconv, and must not touch
        deconvs already wider than the pad (upcorr, channels=49)."""
        import jax

        from dfvo_tpu.models.liteflownet import _DepthwiseDeconv2x

        rng = np.random.RandomState(17)
        x = jnp.array(rng.randn(2, 9, 13, 2).astype(np.float32))
        mod = _DepthwiseDeconv2x(2)
        params = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.delenv("DFVO_DECONV_PAD", raising=False)
        base = np.asarray(mod.apply(params, x))
        monkeypatch.setenv("DFVO_DECONV_PAD", padc)
        var = np.asarray(mod.apply(params, x))
        np.testing.assert_array_equal(base, var)

    def test_deconv_pad_unknown_value_raises(self, monkeypatch):
        import jax

        from dfvo_tpu.models.liteflownet import _DepthwiseDeconv2x

        x = jnp.zeros((1, 4, 4, 2), jnp.float32)
        mod = _DepthwiseDeconv2x(2)
        params = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("DFVO_DECONV_PAD", "9")
        with pytest.raises(ValueError, match="DFVO_DECONV_PAD"):
            mod.apply(params, x)

    @pytest.mark.parametrize("thr", ["32", "64"])
    def test_trunk_mm_matches_conv(self, monkeypatch, thr):
        """DFVO_TRUNK_MM (3x3 trunk conv as 9 shifted matmuls) must match
        nn.Conv on the same params; only Cout <= threshold convs reroute
        (param names/shapes are identical, so the same variables apply)."""
        import jax

        from dfvo_tpu.models.liteflownet import _conv

        class Wrap:
            def __init__(self, features):
                import flax.linen as nn

                class M(nn.Module):
                    @nn.compact
                    def __call__(self, x):
                        return _conv(features, 3, name="c")(x)

                self.mod = M()

        rng = np.random.RandomState(23)
        x = jnp.array(rng.randn(2, 10, 14, 8).astype(np.float32))
        for cout in (32, 64):
            monkeypatch.delenv("DFVO_TRUNK_MM", raising=False)
            base_mod = Wrap(cout).mod
            params = base_mod.init(jax.random.PRNGKey(0), x)
            base = np.asarray(base_mod.apply(params, x))
            monkeypatch.setenv("DFVO_TRUNK_MM", thr)
            var_mod = Wrap(cout).mod
            var = np.asarray(var_mod.apply(params, x))
            # f32 on CPU: reduction order differs (9 partial f32 sums vs
            # one conv accumulation) — tight tolerance, not bitwise
            np.testing.assert_allclose(base, var, rtol=2e-5, atol=2e-5)

    def test_trunk_mm_unknown_value_raises(self, monkeypatch):
        from dfvo_tpu.models.liteflownet import _trunk_mm_threshold

        monkeypatch.setenv("DFVO_TRUNK_MM", "16")  # unsupported threshold
        with pytest.raises(ValueError, match="DFVO_TRUNK_MM"):
            _trunk_mm_threshold()

    def test_frame_ids_match_materialized_pairing(self):
        """grid_sample(unique_src, coords, frame_ids=ids) must be bitwise
        identical to grid_sample(src[ids], coords) — the unique-frame
        warp-table path (r5) gathers from a table over M unique frames
        instead of duplicating target frames into the paired batch."""
        from dfvo_tpu.ops.warp import (
            _grid_sample_gather4,
            _grid_sample_patch4,
            grid_sample,
        )

        rng = np.random.RandomState(21)
        m, h, w, c = 4, 12, 17, 6
        src = jnp.array(rng.randn(m, h, w, c).astype(np.float32))
        ids = np.concatenate([np.arange(1, m), np.arange(0, m - 1)])
        b = len(ids)
        coords = jnp.array(
            rng.uniform(-2, max(h, w) + 2, size=(b, h, w, 2)).astype(
                np.float32
            )
        )
        paired = src[jnp.array(ids)]
        ids_j = jnp.array(ids, dtype=jnp.int32)
        for fn in (_grid_sample_patch4, _grid_sample_gather4):
            np.testing.assert_array_equal(
                np.asarray(fn(paired, coords)),
                np.asarray(fn(src, coords, frame_ids=ids_j)),
                err_msg=fn.__name__,
            )
        np.testing.assert_array_equal(
            np.asarray(grid_sample(paired, coords)),
            np.asarray(grid_sample(src, coords, frame_ids=ids_j)),
        )

    def test_unique_tables_match_materialized(self, monkeypatch):
        """LiteFlowNet consecutive mode with DFVO_UNIQUE_TABLES=1 (warp
        tables built once over unique frames) must match the materialized
        pairing bit-for-bit."""
        import jax

        from dfvo_tpu.models import LiteFlowNet

        rng = np.random.RandomState(13)
        imgs = jnp.array(rng.rand(4, 64, 96, 3).astype(np.float32))
        model = LiteFlowNet(use_pallas=False)
        monkeypatch.setenv("DFVO_UNIQUE_TABLES", "0")
        variables = model.init(
            jax.random.PRNGKey(0), imgs, imgs, pair_mode="consecutive"
        )

        def run():
            return jax.jit(
                lambda v, x: model.apply(v, x, x, pair_mode="consecutive")
            )(variables, imgs)

        base = jax.tree_util.tree_map(np.asarray, run())
        monkeypatch.setenv("DFVO_UNIQUE_TABLES", "1")
        uniq = jax.tree_util.tree_map(np.asarray, run())
        for lvl in base:
            np.testing.assert_array_equal(
                base[lvl], uniq[lvl], err_msg=f"flow level {lvl}"
            )

    def test_unique_tables_unknown_value_raises(self, monkeypatch):
        import jax

        from dfvo_tpu.models import LiteFlowNet

        imgs = jnp.zeros((3, 32, 32, 3), jnp.float32)
        monkeypatch.setenv("DFVO_UNIQUE_TABLES", "yes")  # typo'd probe
        model = LiteFlowNet(use_pallas=False)
        with pytest.raises(ValueError, match="DFVO_UNIQUE_TABLES"):
            model.init(
                jax.random.PRNGKey(0), imgs, imgs, pair_mode="consecutive"
            )

    def test_trunk_barrier_is_identity(self, monkeypatch):
        from dfvo_tpu.models.liteflownet import _trunk_barrier

        x = jnp.array(np.random.RandomState(12).randn(3, 5).astype(np.float32))
        monkeypatch.setenv("DFVO_TRUNK_BARRIER", "1")
        np.testing.assert_array_equal(np.asarray(_trunk_barrier(x)), np.asarray(x))
