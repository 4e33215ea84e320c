"""Converter structural tests: a synthetic torch-layout state dict (keys
following the reference naming, tensors in torch layouts) must convert to
a variables tree that EXACTLY covers the flax model's init tree (same
paths, same shapes, values surviving the layout transforms).

Key names follow rename_layers.py / the reference module attribute paths;
validation against actual released checkpoints needs the weight files
(not shipped in the reference repo).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deformablelka_tpu.models.dlka_former import DLKAFormer
from deformablelka_tpu.convert.torch_loader import convert_dlka_former


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v  # array or ShapeDtypeStruct; both expose .shape
    return out


def _inv_conv(arr):
    nd = arr.ndim - 2
    # (*k, I, O) → (O, I, *k)
    return np.ascontiguousarray(arr.transpose((nd + 1, nd) +
                                              tuple(range(nd))))


def _inv_convT(arr):
    nd = arr.ndim - 2
    # (*k, I, O) → (I, O, *k)
    return np.ascontiguousarray(arr.transpose((nd, nd + 1) +
                                              tuple(range(nd))))


def _synth_sd_from_flax(flat_params, flat_stats):
    """Map every flax param path to its reference torch key + layout."""
    sd = {}

    def conv_key(jp):
        # conv modules store weight/bias; torch side wraps MONAI
        # Convolution (`.conv`) for dynunet-style convs.
        return jp

    for path, arr in flat_params.items():
        parts = path.split("/")
        name = parts[-1]
        tkey = None
        val = arr
        p = path
        # encoder plumbing
        if p == "encoder/stem_conv/weight":
            tkey = "d_lka_former_encoder.downsample_layers.0.0.conv.weight"
            val = _inv_conv(arr)
        elif p.startswith("encoder/stem_norm/"):
            tkey = ("d_lka_former_encoder.downsample_layers.0.1." +
                    {"scale": "weight", "bias": "bias"}[name])
        elif parts[0] == "encoder" and parts[1].startswith("down") and \
                parts[1].endswith("_conv"):
            i = parts[1][4]
            tkey = f"d_lka_former_encoder.downsample_layers.{i}.0.conv.weight"
            val = _inv_conv(arr)
        elif parts[0] == "encoder" and parts[1].startswith("down") and \
                parts[1].endswith("_norm"):
            i = parts[1][4]
            tkey = (f"d_lka_former_encoder.downsample_layers.{i}.1." +
                    {"scale": "weight", "bias": "bias"}[name])
        elif parts[0] == "encoder" and parts[1].startswith("stage"):
            i = parts[1][5]
            j = parts[1].split("block")[1]
            base = f"d_lka_former_encoder.stages.{i}.{j}"
            tkey, val = _trans_block_key(base, parts[2:], arr)
        elif parts[0].startswith("decoder") and parts[1] == "transp_conv":
            tkey = f"{parts[0]}.transp_conv.conv.weight"
            val = _inv_convT(arr)
        elif parts[0].startswith("decoder") and \
                parts[1].startswith("decoder_block"):
            if parts[0] == "decoder2":
                base = "decoder2.decoder_block.0"
                tkey, val = _unet_res_key(base, parts[2:], arr)
            else:
                j = parts[1].split("decoder_block")[1]
                base = f"{parts[0]}.decoder_block.0.{j}"
                tkey, val = _trans_block_key(base, parts[2:], arr)
        elif parts[0] == "encoder1":
            tkey, val = _unet_res_key("encoder1", parts[1:], arr)
        elif parts[0] in ("out1", "out2", "out3"):
            tkey = (f"{parts[0]}.conv.conv." +
                    {"weight": "weight", "bias": "bias"}[name])
            val = _inv_conv(arr) if name == "weight" else arr
        if tkey is None:
            raise AssertionError(f"no torch key rule for {path}")
        sd[tkey] = val

    for path, arr in flat_stats.items():
        parts = path.split("/")
        name = parts[-1]
        tname = {"mean": "running_mean", "var": "running_var"}[name]
        if parts[0] == "encoder1":
            sd[f"encoder1.{parts[1]}.{tname}"] = arr
        elif parts[0] == "decoder2":
            sd[f"decoder2.decoder_block.0.{parts[2]}.{tname}"] = arr
        elif parts[0] == "encoder":
            i = parts[1][5]
            j = parts[1].split("block")[1]
            sd[f"d_lka_former_encoder.stages.{i}.{j}." +
               ".".join(parts[2:-1]).replace("conv51/", "conv51.") +
               f".{tname}"] = arr
        elif parts[0].startswith("decoder"):
            j = parts[1].split("decoder_block")[1]
            sd[f"{parts[0]}.decoder_block.0.{j}." +
               ".".join(parts[2:-1]) + f".{tname}"] = arr
    return sd


def _unet_res_key(base, rest, arr):
    name = rest[-1]
    mod = rest[0]
    if mod.startswith("conv"):
        return f"{base}.{mod}.conv.{name}", (
            _inv_conv(arr) if name == "weight" else arr)
    if mod.startswith("norm"):
        return f"{base}.{mod}." + {"scale": "weight", "bias": "bias"}[name], arr
    raise AssertionError((base, rest))


def _trans_block_key(base, rest, arr):
    name = rest[-1]
    if rest[0] in ("gamma", "pos_embed"):
        return f"{base}.{rest[0]}", arr
    if rest[0] == "norm":
        return f"{base}.norm." + {"scale": "weight", "bias": "bias"}[name], arr
    if rest[0] == "conv51":
        return _unet_res_key(f"{base}.conv51", rest[1:], arr)
    if rest[0] == "conv8":
        return f"{base}.conv8.1.{name}", (
            _inv_conv(arr) if name == "weight" else arr)
    if rest[0] == "epa_block":
        sub = rest[1]
        if sub in ("proj_1", "proj_2"):
            return f"{base}.epa_block.{sub}.{name}", (
                _inv_conv(arr) if name == "weight" else arr)
        if sub == "spatial_gating_unit":
            c = rest[2]
            if c == "deform_conv":
                if rest[3] == "conv_offset":
                    return (f"{base}.epa_block.spatial_gating_unit."
                            f"deform_conv.conv_offset.{name}",
                            _inv_conv(arr) if name == "weight" else arr)
                return (f"{base}.epa_block.spatial_gating_unit."
                        f"deform_conv.{name}",
                        _inv_conv(arr) if name == "weight" else arr)
            return (f"{base}.epa_block.spatial_gating_unit.{c}.{name}",
                    _inv_conv(arr) if name == "weight" else arr)
    raise AssertionError((base, rest))


@pytest.mark.parametrize("trans_block", [
    "TransformerBlock_3D_single_deform_LKA"])
def test_convert_dlka_former_roundtrip(trans_block):
    model = DLKAFormer(out_channels=4, img_size=(16, 32, 32),
                       patch_size=(2, 4, 4), do_ds=True,
                       depths=(1, 1, 1, 1), trans_block=trans_block)
    x = jnp.zeros((1, 16, 32, 32, 1), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    shapes_p = {k: v.shape for k, v in
                _flatten(variables["params"]).items()}
    shapes_s = {k: v.shape for k, v in
                _flatten(variables.get("batch_stats", {})).items()}

    rng = np.random.RandomState(0)
    flat_p = {k: np.asarray(rng.randn(*s), np.float32)
              for k, s in shapes_p.items()}
    flat_s = {k: np.asarray(rng.rand(*s), np.float32)
              for k, s in shapes_s.items()}
    sd = _synth_sd_from_flax(flat_p, flat_s)

    converted = convert_dlka_former(sd, depths=(1, 1, 1, 1))
    conv_p = _flatten(converted["params"])
    conv_s = _flatten(converted["batch_stats"])

    assert set(conv_p) == set(flat_p), (
        f"missing: {set(flat_p) - set(conv_p)}, "
        f"extra: {set(conv_p) - set(flat_p)}")
    for k in flat_p:
        np.testing.assert_array_equal(conv_p[k], flat_p[k]), k
    assert set(conv_s) == set(flat_s)
    for k in flat_s:
        np.testing.assert_array_equal(conv_s[k], flat_s[k])
