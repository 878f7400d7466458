"""Torch checkpoint → Flax parameter conversion.

The reference loads torch checkpoints from its model zoo (monodepth2
encoder/depth/pose .pth, LiteFlowNet .pytorch — monodepth2.py:46-57,
lite_flow.py:45-46). These converters map those state dicts onto the Flax
module trees in this package so pretrained weights reproduce activations
(verified by parity tests against torch reimplementations in
tests/test_model_parity.py).

Conventions: torch convs are OIHW → flax HWIO; torch grouped transposed
convs (C,1,4,4) → spatially flipped (4,4,1,C) dilated-correlation kernels
(see models/liteflownet.py _DepthwiseDeconv2x).
"""

import re

import numpy as np


def _np(t):
    """torch tensor / array -> numpy array."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_w(t):
    """OIHW -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def _deconv_w(t):
    """Grouped ConvTranspose2d (C, 1, kH, kW) -> flipped (kH, kW, 1, C)."""
    w = _np(t)  # (C, 1, kH, kW)
    w = w[:, :, ::-1, ::-1]  # spatial flip: transpose conv -> correlation
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def load_torch_state_dict(path):
    """Load a torch checkpoint into {key: numpy array}."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items() if hasattr(v, "shape")}


def _conv_entry(sd, key, bias=True):
    out = {"kernel": _conv_w(sd[f"{key}.weight"])}
    if bias and f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _bn_entries(sd, key):
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = {
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }
    return params, stats


def convert_resnet_encoder(sd, prefix="encoder."):
    """torchvision-style ResNet-18/34 state dict -> (params, batch_stats).

    Accepts the monodepth2 checkpoint layout where keys carry an
    ``encoder.`` prefix (ResnetEncoder wraps the torchvision model,
    ref resnet_encoder.py:80-82).
    """
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv_w(sd[prefix + "conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn_entries(sd, prefix + "bn1")
    for stage in range(1, 5):
        b = 0
        while f"{prefix}layer{stage}.{b}.conv1.weight" in sd:
            tkey = f"{prefix}layer{stage}.{b}"
            name = f"layer{stage}_{b}"
            p, s = {}, {}
            p["conv1"] = {"kernel": _conv_w(sd[f"{tkey}.conv1.weight"])}
            p["bn1"], s["bn1"] = _bn_entries(sd, f"{tkey}.bn1")
            p["conv2"] = {"kernel": _conv_w(sd[f"{tkey}.conv2.weight"])}
            p["bn2"], s["bn2"] = _bn_entries(sd, f"{tkey}.bn2")
            if f"{tkey}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv_w(sd[f"{tkey}.downsample.0.weight"])
                }
                p["downsample_bn"], s["downsample_bn"] = _bn_entries(
                    sd, f"{tkey}.downsample.1"
                )
            params[name] = p
            stats[name] = s
            b += 1
    return params, stats


_DEC_ORDER = [(4, 0), (4, 1), (3, 0), (3, 1), (2, 0), (2, 1), (1, 0), (1, 1), (0, 0), (0, 1)]


def convert_depth_decoder(sd, scales=(0, 1, 2, 3)):
    """Monodepth2 DepthDecoder state dict -> params.

    torch layout: ``decoder.{0..9}.conv.conv.*`` are the upconv ConvBlocks in
    (4,0),(4,1),...,(0,1) order; ``decoder.{10+s}.conv.*`` the dispconvs
    (ref depth_decoder.py:30-47).
    """
    params = {}
    for idx, (i, j) in enumerate(_DEC_ORDER):
        params[f"upconv_{i}_{j}"] = {
            "conv": {"conv": _conv_entry(sd, f"decoder.{idx}.conv.conv")}
        }
    for n, s in enumerate(scales):
        params[f"dispconv_{s}"] = {
            "conv": _conv_entry(sd, f"decoder.{10 + n}.conv")
        }
    return params


def convert_pose_decoder(sd):
    """Monodepth2 PoseDecoder state dict -> params (torch ``net.{0..3}``
    = squeeze, pose_0, pose_1, pose_2; ref pose_decoder.py:25-33)."""
    return {
        "squeeze": _conv_entry(sd, "net.0"),
        "pose_0": _conv_entry(sd, "net.1"),
        "pose_1": _conv_entry(sd, "net.2"),
        "pose_2": _conv_entry(sd, "net.3"),
    }


def convert_monodepth2_depth(encoder_sd, decoder_sd):
    """-> flax variables for models.Monodepth2Depth."""
    enc_p, enc_s = convert_resnet_encoder(encoder_sd)
    return {
        "params": {"encoder": enc_p, "decoder": convert_depth_decoder(decoder_sd)},
        "batch_stats": {"encoder": enc_s},
    }


def convert_monodepth2_pose(encoder_sd, decoder_sd):
    """-> flax variables for models.Monodepth2Pose."""
    enc_p, enc_s = convert_resnet_encoder(encoder_sd)
    return {
        "params": {"encoder": enc_p, "decoder": convert_pose_decoder(decoder_sd)},
        "batch_stats": {"encoder": enc_s},
    }


# ---------------------------------------------------------------------------
# generic name-mirroring converter (HD3)
# ---------------------------------------------------------------------------

# transposed convolutions need different axis handling than convs; these are
# the only ConvTranspose2d sites in HD3 (dla_up.py IDAUp.up_i grouped;
# hd3net.py Decoder.up[2] ungrouped)
_DECONV_GROUPED = re.compile(r"(^|\.)up_\d+\.weight$")
_DECONV_PLAIN = re.compile(r"Decoder_\d+\.up\.2\.weight$")


def _merge_path(key):
    """torch dotted path -> flax path components; Sequential indices merge
    into the parent name (``base_layer.0`` -> ``base_layer_0``)."""
    parts = []
    for comp in key.split("."):
        if comp.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{comp}"
        else:
            parts.append(comp)
    return parts


def _put(tree, path, leaf, val):
    node = tree
    for comp in path:
        node = node.setdefault(comp, {})
    node[leaf] = val


def convert_torch_module_tree(sd, prefix=""):
    """Generic torch state dict -> (params, batch_stats) for flax modules
    whose submodule names mirror the torch attribute tree (with Sequential
    indices as ``_i`` suffixes). Used for the HD3 family."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    bn_prefixes = {
        k[: -len(".running_mean")]
        for k in sd
        if k.endswith(".running_mean")
    }
    params, stats = {}, {}
    for key, val in sd.items():
        if key.endswith(".num_batches_tracked"):
            continue
        mod_key, leaf = key.rsplit(".", 1)
        path = _merge_path(mod_key)
        if mod_key in bn_prefixes:
            if leaf == "weight":
                _put(params, path, "scale", _np(val))
            elif leaf == "bias":
                _put(params, path, "bias", _np(val))
            elif leaf == "running_mean":
                _put(stats, path, "mean", _np(val))
            elif leaf == "running_var":
                _put(stats, path, "var", _np(val))
            continue
        arr = _np(val)
        if leaf == "weight" and arr.ndim == 4:
            if _DECONV_GROUPED.search(key):
                # grouped ConvTranspose (C, 1, k, k) -> (k, k, 1, C) flipped
                w = arr[:, :, ::-1, ::-1]
                _put(
                    params, path, "kernel",
                    np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                )
            elif _DECONV_PLAIN.search(key):
                # plain ConvTranspose (Cin, Cout, k, k) -> (k, k, Cin, Cout)
                w = arr[:, :, ::-1, ::-1]
                _put(
                    params, path, "kernel",
                    np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
                )
            else:
                _put(params, path, "kernel", arr.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            _put(params, path, "bias", arr)
        elif leaf == "weight" and arr.ndim == 1:
            _put(params, path, "scale", arr)
        else:
            raise ValueError(f"unhandled torch key: {key} (shape {arr.shape})")
    return params, stats


def convert_hd3(sd):
    """HD3 checkpoint state dict -> flax variables for models.hd3.HD3Net.
    Accepts checkpoints with the ``hd3net.`` (HD3Model wrapper) prefix."""
    prefix = "hd3net." if any(k.startswith("hd3net.") for k in sd) else ""
    params, stats = convert_torch_module_tree(sd, prefix=prefix)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# LiteFlowNet
# ---------------------------------------------------------------------------

_LFN_FEATURES = {
    "one_0": "moduleOne.0",
    "two_0": "moduleTwo.0",
    "two_1": "moduleTwo.2",
    "two_2": "moduleTwo.4",
    "thr_0": "moduleThr.0",
    "thr_1": "moduleThr.2",
    "fou_0": "moduleFou.0",
    "fou_1": "moduleFou.2",
    "fiv_0": "moduleFiv.0",
    "six_0": "moduleSix.0",
}


def convert_liteflownet(sd):
    """LiteFlowNet ``network-*.pytorch`` state dict -> flax params.

    torch ModuleLists index levels [2,3,4,5,6] as 0..4
    (ref lite_flow_net.py:267-269).
    """
    params = {}
    params["features"] = {
        ours: _conv_entry(sd, f"moduleFeatures.{theirs}")
        for ours, theirs in _LFN_FEATURES.items()
    }
    for i, lvl in enumerate([2, 3, 4, 5, 6]):
        # Matching
        m = {}
        if lvl == 2:
            m["feat_conv"] = _conv_entry(sd, f"moduleMatching.{i}.moduleFeat.0")
        if lvl != 6:
            m["upflow"] = {
                "kernel": _deconv_w(sd[f"moduleMatching.{i}.moduleUpflow.weight"])
            }
        if lvl < 4:
            m["upcorr"] = {
                "kernel": _deconv_w(sd[f"moduleMatching.{i}.moduleUpcorr.weight"])
            }
        for j, t in enumerate([0, 2, 4, 6]):
            m[f"main_{j}"] = _conv_entry(sd, f"moduleMatching.{i}.moduleMain.{t}")
        params[f"matching_{lvl}"] = m

        # Subpixel
        s = {}
        if lvl == 2:
            s["feat_conv"] = _conv_entry(sd, f"moduleSubpixel.{i}.moduleFeat.0")
        for j, t in enumerate([0, 2, 4, 6]):
            s[f"main_{j}"] = _conv_entry(sd, f"moduleSubpixel.{i}.moduleMain.{t}")
        params[f"subpixel_{lvl}"] = s

        # Regularization
        r = {}
        if lvl < 5:
            r["feat_conv"] = _conv_entry(
                sd, f"moduleRegularization.{i}.moduleFeat.0"
            )
        for j, t in enumerate([0, 2, 4, 6, 8, 10]):
            r[f"main_{j}"] = _conv_entry(
                sd, f"moduleRegularization.{i}.moduleMain.{t}"
            )
        if lvl >= 5:
            r["dist"] = _conv_entry(sd, f"moduleRegularization.{i}.moduleDist.0")
        else:
            r["dist_ver"] = _conv_entry(
                sd, f"moduleRegularization.{i}.moduleDist.0"
            )
            r["dist_hor"] = _conv_entry(
                sd, f"moduleRegularization.{i}.moduleDist.1"
            )
        r["scale_x"] = _conv_entry(sd, f"moduleRegularization.{i}.moduleScaleX")
        r["scale_y"] = _conv_entry(sd, f"moduleRegularization.{i}.moduleScaleY")
        params[f"regularization_{lvl}"] = r

    return {"params": params}
