"""torch → JAX weight converter.

Handles the reference's checkpoint layouts (SURVEY.md §5 "Checkpoint"):
- 3D: `model_final_checkpoint.model` dicts with `state_dict` (NCDHW convs),
  keys possibly prefixed `unetr_pp_encoder`/`d_lka_former_encoder` etc.
  (3D/rename_layers.py:12-23 renames unetr_pp→d_lka_former — both accepted
  here).
- 2D: bare `state_dict` .pth (trainer_MaxViT_deform_LKA.py:180-183).
- skin: {"model_weights": state_dict, "val_loss": …}
  (train_skin_2017.py:146-150).

Tensor layout conversions:
  ConvNd weight (O, I, *k)     → (*k, I, O)
  ConvTransposeNd (I, O, *k)   → (*k, I, O)
  Linear (O, I)                → (I, O)
  Norm weight/bias             → scale/bias (unchanged)
  BatchNorm running stats      → batch_stats collection

The flax modules were named to mirror the torch attribute paths, so key
translation is a mechanical path rewrite per model family.
"""

from __future__ import annotations

import io
import re
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into {key: numpy array} without CUDA."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for k in ("state_dict", "model_weights", "network_weights"):
            if k in obj and isinstance(obj[k], dict):
                obj = obj[k]
                break
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def convert_tensor(name: str, arr: np.ndarray, kind: str) -> np.ndarray:
    """kind: conv | conv_transpose | linear | none."""
    if kind == "conv":
        # (O, I, *k) → (*k, I, O)
        nd = arr.ndim - 2
        perm = tuple(range(2, 2 + nd)) + (1, 0)
        return np.ascontiguousarray(arr.transpose(perm))
    if kind == "conv_transpose":
        # (I, O, *k) → (*k, I, O)
        nd = arr.ndim - 2
        perm = tuple(range(2, 2 + nd)) + (0, 1)
        return np.ascontiguousarray(arr.transpose(perm))
    if kind == "linear":
        return np.ascontiguousarray(arr.T)
    return arr


def _set(tree: dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^module\.", "", k)
        k = k.replace("unetr_pp_encoder", "d_lka_former_encoder")
        k = k.replace("unetr_pp", "d_lka_former")
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# D-LKA Former (3D)
# ---------------------------------------------------------------------------

def convert_dlka_former(sd: Dict[str, np.ndarray],
                        depths=(3, 3, 3, 3),
                        only_block=None) -> Dict[str, Any]:
    """Build {"params": ..., "batch_stats": ...} for models.DLKAFormer from
    a reference 3D state_dict.

    only_block=(jpath, tkey) converts a single TransformerBlock_* family
    state dict (any of the 14 --trans_block variants) instead of the
    full model — used by the per-variant golden tests and by checkpoint
    surgery."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}

    def put(path, key, kind):
        if key not in sd:
            return False
        _set(params, path, convert_tensor(key, sd[key], kind))
        return True

    def put_norm(path, tkey):
        """torch norm (weight, bias) → scale/bias."""
        ok = False
        if f"{tkey}.weight" in sd:
            _set(params, f"{path}/scale", sd[f"{tkey}.weight"])
            ok = True
        if f"{tkey}.bias" in sd:
            _set(params, f"{path}/bias", sd[f"{tkey}.bias"])
            ok = True
        if f"{tkey}.running_mean" in sd:
            _set(stats, f"{path}/mean", sd[f"{tkey}.running_mean"])
            _set(stats, f"{path}/var", sd[f"{tkey}.running_var"])
        return ok

    def conv_block(jpath, tkey):
        """MONAI Convolution wrapper: <tkey>.conv.weight."""
        put(f"{jpath}/weight", f"{tkey}.conv.weight", "conv")
        put(f"{jpath}/bias", f"{tkey}.conv.bias", "none")

    def unet_res_block(jpath, tkey):
        conv_block(f"{jpath}/conv1", f"{tkey}.conv1")
        conv_block(f"{jpath}/conv2", f"{tkey}.conv2")
        put_norm(f"{jpath}/norm1", f"{tkey}.norm1")
        put_norm(f"{jpath}/norm2", f"{tkey}.norm2")
        if f"{tkey}.conv3.conv.weight" in sd:
            conv_block(f"{jpath}/conv3", f"{tkey}.conv3")
            put_norm(f"{jpath}/norm3", f"{tkey}.norm3")

    def trans_block(jpath, tkey):
        """TransformerBlock family → _SkeletonBlock params."""
        if f"{tkey}.pos_embed" in sd:
            _set(params, f"{jpath}/pos_embed", sd[f"{tkey}.pos_embed"])
        _set(params, f"{jpath}/gamma", sd[f"{tkey}.gamma"])
        put_norm(f"{jpath}/norm", f"{tkey}.norm")
        unet_res_block(f"{jpath}/conv51", f"{tkey}.conv51")
        # conv8 = Sequential(Dropout, Conv3d) → index 1
        put(f"{jpath}/conv8/weight", f"{tkey}.conv8.1.weight", "conv")
        put(f"{jpath}/conv8/bias", f"{tkey}.conv8.1.bias", "none")
        # EPA blocks
        if f"{tkey}.epa_block.qkvv.weight" in sd:
            put(f"{jpath}/epa_block/qkvv/weight",
                f"{tkey}.epa_block.qkvv.weight", "linear")
            put(f"{jpath}/epa_block/E/weight",
                f"{tkey}.epa_block.E.weight", "linear")
            put(f"{jpath}/epa_block/E/bias",
                f"{tkey}.epa_block.E.bias", "none")
            _set(params, f"{jpath}/epa_block/temperature",
                 sd[f"{tkey}.epa_block.temperature"])
            _set(params, f"{jpath}/epa_block/temperature2",
                 sd[f"{tkey}.epa_block.temperature2"])
            put(f"{jpath}/epa_block/out_proj/weight",
                f"{tkey}.epa_block.out_proj.weight", "linear")
            put(f"{jpath}/epa_block/out_proj/bias",
                f"{tkey}.epa_block.out_proj.bias", "none")
            put(f"{jpath}/epa_block/out_proj2/weight",
                f"{tkey}.epa_block.out_proj2.weight", "linear")
            put(f"{jpath}/epa_block/out_proj2/bias",
                f"{tkey}.epa_block.out_proj2.bias", "none")
        def gated(jg_root, tg_root):
            """LKA_Attention3d* → GatedAttention3d: proj_1/proj_2 +
            spatial_gating_unit with conv0/conv_spatial/(conv)/
            (deform_conv)/conv1."""
            for proj in ("proj_1", "proj_2"):
                put(f"{jg_root}/{proj}/weight", f"{tg_root}.{proj}.weight",
                    "conv")
                put(f"{jg_root}/{proj}/bias", f"{tg_root}.{proj}.bias",
                    "none")
            g = f"{tg_root}.spatial_gating_unit"
            jg = f"{jg_root}/spatial_gating_unit"
            for c in ("conv0", "conv_spatial", "conv1", "conv"):
                put(f"{jg}/{c}/weight", f"{g}.{c}.weight", "conv")
                put(f"{jg}/{c}/bias", f"{g}.{c}.bias", "none")
            if f"{g}.deform_conv.conv_offset.weight" in sd:
                put(f"{jg}/deform_conv/weight", f"{g}.deform_conv.weight",
                    "conv")
                put(f"{jg}/deform_conv/bias", f"{g}.deform_conv.bias",
                    "none")
                put(f"{jg}/deform_conv/conv_offset/weight",
                    f"{g}.deform_conv.conv_offset.weight", "conv")
                put(f"{jg}/deform_conv/conv_offset/bias",
                    f"{g}.deform_conv.conv_offset.bias", "none")
            elif f"{g}.deform_conv.weight" in sd:
                # LKA3d_conv (transformerblock.py:746-764) calls its plain
                # dense 3^3 conv "deform_conv"; our module names it `conv`.
                put(f"{jg}/conv/weight", f"{g}.deform_conv.weight", "conv")
                put(f"{jg}/conv/bias", f"{g}.deform_conv.bias", "none")

        te = f"{tkey}.epa_block"
        # TransformerBlock_2Dsingle (:498-568): per-slice 2D deform LKA.
        # Our SliceDeformableLKA2d flattens the gating unit into
        # epa_block and keeps torchvision-style offset_net params.
        if f"{te}.spatial_gating_unit.conv0.offset_net.weight" in sd:
            je = f"{jpath}/epa_block"
            for proj in ("proj_1", "proj_2"):
                put(f"{je}/{proj}/weight", f"{te}.{proj}.weight", "conv")
                put(f"{je}/{proj}/bias", f"{te}.{proj}.bias", "none")
            g = f"{te}.spatial_gating_unit"
            for c in ("conv0", "conv_spatial"):
                put(f"{je}/{c}/offset_net/weight",
                    f"{g}.{c}.offset_net.weight", "conv")
                put(f"{je}/{c}/offset_net/bias",
                    f"{g}.{c}.offset_net.bias", "none")
                put(f"{je}/{c}/deform_conv_weight",
                    f"{g}.{c}.deform_conv.weight", "conv")
            put(f"{je}/conv1/weight", f"{g}.conv1.weight", "conv")
            put(f"{je}/conv1/bias", f"{g}.conv1.bias", "none")
        # Plain gated LKA variants (epa_block = LKA_Attention3d*)
        elif f"{te}.proj_1.weight" in sd:
            gated(f"{jpath}/epa_block", te)
        # TransformerBlock_EA (:218-283); its temperature params are dead
        if f"{te}.query_lin.weight" in sd:
            for lin in ("query_lin", "key_lin", "value_lin",
                        "reprojection"):
                put(f"{jpath}/epa_block/{lin}/weight",
                    f"{te}.{lin}.weight", "linear")
                put(f"{jpath}/epa_block/{lin}/bias",
                    f"{te}.{lin}.bias", "none")
        # TransformerBlock_SE (:1354-1419): block-level SE + gated LKA
        if f"{tkey}.LKA_block.proj_1.weight" in sd:
            gated(f"{jpath}/LKA_block", f"{tkey}.LKA_block")
            put(f"{jpath}/se_fc1/weight", f"{tkey}.se.fc1.weight", "conv")
            put(f"{jpath}/se_fc1/bias", f"{tkey}.se.fc1.bias", "none")
            put(f"{jpath}/se_fc2/weight", f"{tkey}.se.fc2.weight", "conv")
            put(f"{jpath}/se_fc2/bias", f"{tkey}.se.fc2.bias", "none")
        # Paired attention+LKA variants ({Spatial,Channel}Attention_*LKA*,
        # :794-868/:979-1041/:1151-1216/:1673-1737/:1872-1944):
        # epa_block.{qkv,(E),temperature,lka,...} → attn/lka/fusion split
        if f"{te}.lka.proj_1.weight" in sd:
            put(f"{jpath}/attn/qkv/weight", f"{te}.qkv.weight", "linear")
            _set(params, f"{jpath}/attn/temperature",
                 sd[f"{te}.temperature"])
            if f"{te}.E.weight" in sd:  # spatial halves share E = F
                put(f"{jpath}/attn/E/weight", f"{te}.E.weight", "linear")
                put(f"{jpath}/attn/E/bias", f"{te}.E.bias", "none")
            gated(f"{jpath}/lka", f"{te}.lka")
            if f"{te}.out_proj2.weight" in sd:  # parallel concat fusion
                for op in ("out_proj", "out_proj2"):
                    put(f"{jpath}/{op}/weight", f"{te}.{op}.weight",
                        "linear")
                    put(f"{jpath}/{op}/bias", f"{te}.{op}.bias", "none")
                if f"{te}.norm.weight" in sd:  # channel_norm variant
                    put_norm(f"{jpath}/fuse_norm", f"{te}.norm")
                    put_norm(f"{jpath}/fuse_norm2", f"{te}.norm2")
                    _set(params, f"{jpath}/temperature2",
                         sd[f"{te}.temperature2"])
            else:  # *_sequential: attn → norm → lka → norm2 → out_proj
                put_norm(f"{jpath}/fuse_norm", f"{te}.norm")
                put_norm(f"{jpath}/fuse_norm2", f"{te}.norm2")
                put(f"{jpath}/out_proj/weight", f"{te}.out_proj.weight",
                    "linear")
                put(f"{jpath}/out_proj/bias", f"{te}.out_proj.bias",
                    "none")

    if only_block is not None:
        trans_block(*only_block)
        return {"params": params, "batch_stats": stats}

    # Encoder
    enc_t = "d_lka_former_encoder"
    _set(params, "encoder/stem_conv/weight", convert_tensor(
        "", sd[f"{enc_t}.downsample_layers.0.0.conv.weight"], "conv"))
    put_norm("encoder/stem_norm", f"{enc_t}.downsample_layers.0.1")
    for i in range(1, 4):
        put(f"encoder/down{i}_conv/weight",
            f"{enc_t}.downsample_layers.{i}.0.conv.weight", "conv")
        put_norm(f"encoder/down{i}_norm", f"{enc_t}.downsample_layers.{i}.1")
    for i in range(4):
        for j in range(depths[i]):
            trans_block(f"encoder/stage{i}_block{j}",
                        f"{enc_t}.stages.{i}.{j}")

    # encoder1 (full-res conv branch)
    unet_res_block("encoder1", "encoder1")

    # Decoders
    for dec, n_blocks in (("decoder5", 3), ("decoder4", 3), ("decoder3", 3)):
        put(f"{dec}/transp_conv/weight", f"{dec}.transp_conv.conv.weight",
            "conv_transpose")
        for j in range(n_blocks):
            trans_block(f"{dec}/decoder_block{j}",
                        f"{dec}.decoder_block.0.{j}")
    put("decoder2/transp_conv/weight", "decoder2.transp_conv.conv.weight",
        "conv_transpose")
    unet_res_block("decoder2/decoder_block", "decoder2.decoder_block.0")

    # Output heads
    for out in ("out1", "out2", "out3"):
        conv_block(f"{out}/conv", f"{out}.conv")

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# 2D MaxViT D-LKA (converter for the decoder + backbone)
# ---------------------------------------------------------------------------

def _convert_deform_conv2d(params, jpath, sd, tkey):
    put = lambda p, k, kind: (_set(params, p, convert_tensor(k, sd[k], kind))
                              if k in sd else None)
    put(f"{jpath}/offset_net/weight", f"{tkey}.offset_net.weight", "conv")
    put(f"{jpath}/offset_net/bias", f"{tkey}.offset_net.bias", "none")
    if f"{tkey}.deform_conv.weight" in sd:
        _set(params, f"{jpath}/deform_conv_weight",
             convert_tensor("", sd[f"{tkey}.deform_conv.weight"], "conv"))


def _convert_lka_decoders(params, stats, sd, deformable: bool):
    """Convert the decoder_3..decoder_0 LKA decoder stack shared by
    every 2D *_LKA_Decoder reference file (MaxViT_deform_LKA.py:545-620,
    MaxViT_LKA_Decoder.py / DAT_LKA_Decoder.py / mvit_LKA_Decoder.py /
    STViTEncoder_LKADecoder.py MyDecoderLayer).

    deformable=False maps the plain-LKABlock decoders and only
    layer_lka_1 — those references apply it twice ("LEON CHANGE
    THIS!"), leaving layer_lka_2 / layer_former_* / cross_attn /
    concat_linear dead; the flax DecoderLayer reproduces the reuse."""

    def put(path, key, kind):
        if key not in sd:
            return False
        _set(params, path, convert_tensor(key, sd[key], kind))
        return True

    def put_norm(path, tkey, stats_too=True):
        if f"{tkey}.weight" in sd:
            _set(params, f"{path}/scale", sd[f"{tkey}.weight"])
            _set(params, f"{path}/bias", sd[f"{tkey}.bias"])
        if stats_too and f"{tkey}.running_mean" in sd:
            _set(stats, f"{path}/mean", sd[f"{tkey}.running_mean"])
            _set(stats, f"{path}/var", sd[f"{tkey}.running_var"])

    def lka_block(jpath, tkey):
        """deformableLKABlock / LKABlock → nn.lka2d counterparts."""
        put_norm(f"{jpath}/norm1", f"{tkey}.norm1", False)
        put_norm(f"{jpath}/norm2", f"{tkey}.norm2", False)
        _set(params, f"{jpath}/layer_scale_1", sd[f"{tkey}.layer_scale_1"])
        _set(params, f"{jpath}/layer_scale_2", sd[f"{tkey}.layer_scale_2"])
        a, ja = f"{tkey}.attn", f"{jpath}/attn"
        for proj in ("proj_1", "proj_2"):
            put(f"{ja}/{proj}/weight", f"{a}.{proj}.weight", "conv")
            put(f"{ja}/{proj}/bias", f"{a}.{proj}.bias", "none")
        g, jg = f"{a}.spatial_gating_unit", f"{ja}/spatial_gating_unit"
        for c in ("conv0", "conv_spatial"):
            if deformable:
                _convert_deform_conv2d(params, f"{jg}/{c}", sd, f"{g}.{c}")
            else:
                put(f"{jg}/{c}/weight", f"{g}.{c}.weight", "conv")
                put(f"{jg}/{c}/bias", f"{g}.{c}.bias", "none")
        put(f"{jg}/conv1/weight", f"{g}.conv1.weight", "conv")
        put(f"{jg}/conv1/bias", f"{g}.conv1.bias", "none")
        m, jm = f"{tkey}.mlp", f"{jpath}/mlp"
        put(f"{jm}/fc1/weight", f"{m}.fc1.weight", "conv")
        put(f"{jm}/fc1/bias", f"{m}.fc1.bias", "none")
        put(f"{jm}/fc2/weight", f"{m}.fc2.weight", "conv")
        put(f"{jm}/fc2/bias", f"{m}.fc2.bias", "none")
        put(f"{jm}/dwconv/dwconv/weight", f"{m}.dwconv.dwconv.weight",
            "conv")
        put(f"{jm}/dwconv/dwconv/bias", f"{m}.dwconv.dwconv.bias", "none")

    for idx, name in ((3, "decoder_3"), (2, "decoder_2"), (1, "decoder_1"),
                      (0, "decoder_0")):
        j = name
        if idx != 3:
            # decoder_3.x1_linear exists in the reference checkpoint but
            # is dead code (MyDecoderLayer.forward with x2=None only runs
            # layer_up, MaxViT_deform_LKA.py:618-620); the flax decoder_3
            # never materialises it.
            put(f"{j}/x1_linear/weight", f"{name}.x1_linear.weight",
                "linear")
            put(f"{j}/x1_linear/bias", f"{name}.x1_linear.bias", "none")
        put(f"{j}/layer_up/expand/weight", f"{name}.layer_up.expand.weight",
            "linear")
        put_norm(f"{j}/layer_up/norm", f"{name}.layer_up.norm", False)
        if f"{name}.layer_lka_1.norm1.weight" in sd and idx != 3:
            lka_block(f"{j}/layer_lka_1", f"{name}.layer_lka_1")
            if deformable:  # non-deform layer_lka_2 is dead (see above)
                lka_block(f"{j}/layer_lka_2", f"{name}.layer_lka_2")
        put(f"{j}/last_layer/weight", f"{name}.last_layer.weight", "conv")
        put(f"{j}/last_layer/bias", f"{name}.last_layer.bias", "none")


def convert_maxvit_dlka(sd: Dict[str, np.ndarray],
                        deformable: bool = True) -> Dict[str, Any]:
    """Convert a 2D MaxViT_deformableLKAFormer state_dict (.pth) to
    models.MaxViTDeformableLKAFormer variables.

    deformable=False converts the LKA Baseline (MaxViTLKAFormer,
    2D/networks/MaxViT_LKA_Decoder.py) — see _convert_lka_decoders."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}
    _convert_lka_decoders(params, stats, sd, deformable)
    # Backbone (timm maxxvit): delegated key map
    _convert_maxvit_backbone(params, stats, sd, prefix="backbone.backbone",
                             jprefix="backbone")
    return {"params": params, "batch_stats": stats}


def convert_datlka(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a DATLKAFormer state_dict (2D/networks/DAT_LKA_Decoder.py)
    to models.dat_lka.DATLKAFormer variables.

    Decoders via _convert_lka_decoders(deformable=False). Backbone =
    DAT (DAT/dat_4out.py): stages.N.{layer_norms,attns,mlps}.M →
    stages_N/{layer_norms,attns,mlps}_M; LayerNormProxy `.norm.weight`
    → `scale`; DAttention conv_offset.[0,1,3] → offset_dw/offset_norm/
    offset_proj; its torch-conv-1×1 proj_k/proj_v feed flax Linears
    (token-space), so their kernels are squeezed to (in, out). The
    rel-pos tables (relative_position_bias_table, rpe_table) pass
    through unchanged; buffers and the unused cls head are skipped."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}
    _convert_lka_decoders(params, stats, sd, deformable=False)

    def norm_leaf(p):
        return "scale" if p == "weight" else "bias"

    for key, v in sd.items():
        if not key.startswith("backbone."):
            continue
        parts = key.split(".")[1:]
        if parts[0] in ("cls_norm", "cls_head"):
            continue
        if parts[-1] in ("relative_position_index", "attn_mask"):
            continue
        arr = np.asarray(v)
        leaf = parts[-1]
        if parts[0] == "patch_proj":
            if parts[1] == "0":
                kind = "conv" if leaf == "weight" else "none"
                _set(params, f"backbone/patch_proj/{leaf}",
                     convert_tensor(key, arr, kind))
            else:  # patch_proj.1.norm (LayerNormProxy)
                _set(params, f"backbone/patch_norm/{norm_leaf(leaf)}", arr)
        elif parts[0] == "down_projs":
            i = parts[1]
            if parts[2] == "0":
                _set(params, f"backbone/down_projs_{i}/weight",
                     convert_tensor(key, arr, "conv"))
            else:
                _set(params, f"backbone/down_norm_{i}/{norm_leaf(leaf)}",
                     arr)
        elif parts[0] == "stages":
            s, sub = parts[1], parts[2]
            base = f"backbone/stages_{s}"
            if sub == "layer_norms":
                _set(params,
                     f"{base}/layer_norms_{parts[3]}/{norm_leaf(leaf)}",
                     arr)
            elif sub == "mlps":
                # mlps.M.chunk.linearX → mlps_M/linearX
                kind = "linear" if leaf == "weight" else "none"
                _set(params, f"{base}/mlps_{parts[3]}/{parts[5]}/{leaf}",
                     convert_tensor(key, arr, kind))
            elif sub == "attns":
                ab = f"{base}/attns_{parts[3]}"
                name = parts[4]
                if name in ("relative_position_bias_table", "rpe_table"):
                    _set(params, f"{ab}/{name}", arr)
                elif name == "conv_offset":
                    idx = parts[5]
                    if idx == "0":
                        kind = "conv" if leaf == "weight" else "none"
                        _set(params, f"{ab}/offset_dw/{leaf}",
                             convert_tensor(key, arr, kind))
                    elif idx == "1":
                        _set(params,
                             f"{ab}/offset_norm/{norm_leaf(leaf)}", arr)
                    else:  # conv_offset.3: 1×1, no bias
                        _set(params, f"{ab}/offset_proj/weight",
                             convert_tensor(key, arr, "conv"))
                elif name in ("proj_k", "proj_v") and arr.ndim == 4:
                    # torch Conv2d 1×1 on sampled tokens → flax Linear
                    _set(params, f"{ab}/{name}/weight",
                         arr[:, :, 0, 0].T.copy())
                elif arr.ndim == 4:
                    _set(params, f"{ab}/{name}/{leaf}",
                         convert_tensor(key, arr, "conv"))
                elif arr.ndim == 2:
                    _set(params, f"{ab}/{name}/{leaf}",
                         convert_tensor(key, arr, "linear"))
                else:
                    _set(params, f"{ab}/{name}/{leaf}", arr)
    return {"params": params}


def _convert_maxvit_backbone(params, stats, sd, prefix, jprefix,
                             depths=(2, 2, 5, 2)):
    def put(path, key, kind):
        if key not in sd:
            return False
        _set(params, path, convert_tensor(key, sd[key], kind))
        return True

    def put_bn(jpath, tkey):
        if f"{tkey}.weight" in sd:
            _set(params, f"{jpath}/bn/scale", sd[f"{tkey}.weight"])
            _set(params, f"{jpath}/bn/bias", sd[f"{tkey}.bias"])
        if f"{tkey}.running_mean" in sd:
            _set(stats, f"{jpath}/bn/mean", sd[f"{tkey}.running_mean"])
            _set(stats, f"{jpath}/bn/var", sd[f"{tkey}.running_var"])

    def put_ln(jpath, tkey):
        if f"{tkey}.weight" in sd:
            _set(params, f"{jpath}/scale", sd[f"{tkey}.weight"])
            _set(params, f"{jpath}/bias", sd[f"{tkey}.bias"])

    # Stem (convs are bias-free in the timm rw checkpoint)
    put(f"{jprefix}/stem/conv1/weight", f"{prefix}.stem.conv1.weight",
        "conv")
    put_bn(f"{jprefix}/stem/norm1", f"{prefix}.stem.norm1")
    put(f"{jprefix}/stem/conv2/weight", f"{prefix}.stem.conv2.weight",
        "conv")

    for s, depth in enumerate(depths):
        for b in range(depth):
            t = f"{prefix}.stages.{s}.blocks.{b}"
            j = f"{jprefix}/stage{s}_block{b}"
            # MbConv
            c = f"{t}.conv"
            put_bn(f"{j}/conv/pre_norm", f"{c}.pre_norm")
            if f"{c}.shortcut.expand.weight" in sd:
                put(f"{j}/conv/shortcut/expand/weight",
                    f"{c}.shortcut.expand.weight", "conv")
            put(f"{j}/conv/conv1_1x1/weight", f"{c}.conv1_1x1.weight",
                "conv")
            put_bn(f"{j}/conv/norm1", f"{c}.norm1")
            put(f"{j}/conv/conv2_kxk/weight", f"{c}.conv2_kxk.weight",
                "conv")
            put_bn(f"{j}/conv/norm2", f"{c}.norm2")
            put(f"{j}/conv/se/fc1/weight", f"{c}.se.fc1.weight", "conv")
            put(f"{j}/conv/se/fc1/bias", f"{c}.se.fc1.bias", "none")
            put(f"{j}/conv/se/fc2/weight", f"{c}.se.fc2.weight", "conv")
            put(f"{j}/conv/se/fc2/bias", f"{c}.se.fc2.bias", "none")
            put(f"{j}/conv/conv3_1x1/weight", f"{c}.conv3_1x1.weight",
                "conv")
            # Partition attentions
            for part in ("attn_block", "attn_grid"):
                a = f"{t}.{part}"
                ja = f"{j}/{part}"
                put_ln(f"{ja}/norm1", f"{a}.norm1")
                put_ln(f"{ja}/norm2", f"{a}.norm2")
                if f"{a}.ls1.gamma" in sd:
                    _set(params, f"{ja}/ls1", sd[f"{a}.ls1.gamma"])
                    _set(params, f"{ja}/ls2", sd[f"{a}.ls2.gamma"])
                put(f"{ja}/attn/qkv/weight", f"{a}.attn.qkv.weight",
                    "linear")
                put(f"{ja}/attn/qkv/bias", f"{a}.attn.qkv.bias", "none")
                put(f"{ja}/attn/proj/weight", f"{a}.attn.proj.weight",
                    "linear")
                put(f"{ja}/attn/proj/bias", f"{a}.attn.proj.bias", "none")
                put(f"{ja}/attn/rel_pos/mlp_fc1/weight",
                    f"{a}.attn.rel_pos.mlp.fc1.weight", "linear")
                put(f"{ja}/attn/rel_pos/mlp_fc1/bias",
                    f"{a}.attn.rel_pos.mlp.fc1.bias", "none")
                put(f"{ja}/attn/rel_pos/mlp_fc2/weight",
                    f"{a}.attn.rel_pos.mlp.fc2.weight", "linear")
                put(f"{ja}/attn/rel_pos/mlp_fc2/bias",
                    f"{a}.attn.rel_pos.mlp.fc2.bias", "none")
                put(f"{ja}/mlp_fc1/weight", f"{a}.mlp.fc1.weight", "linear")
                put(f"{ja}/mlp_fc1/bias", f"{a}.mlp.fc1.bias", "none")
                put(f"{ja}/mlp_fc2/weight", f"{a}.mlp.fc2.weight", "linear")
                put(f"{ja}/mlp_fc2/bias", f"{a}.mlp.fc2.bias", "none")
    put_ln(f"{jprefix}/final_norm", f"{prefix}.norm")


def load_maxvit_backbone(path: str, params: dict) -> dict:
    """Warm-start the 2D model's MaxViT encoder from a timm ImageNet
    checkpoint (merit_lib/networks.py:239-252 loads
    maxvit_rmlp_small_rw_224_sw-*.pth into the backbone before training).

    `path` is a bare timm state_dict (keys like 'stem.conv1.weight');
    returns a copy of `params` with params['backbone'] replaced."""


    sd = load_torch_state_dict(path)
    # tolerate either bare timm keys or a wrapped 'backbone.' prefix
    if any(k.startswith("backbone.") for k in sd):
        prefix = ("backbone.backbone"
                  if any(k.startswith("backbone.backbone.") for k in sd)
                  else "backbone")
    else:
        sd = {f"backbone.{k}": v for k, v in sd.items()}
        prefix = "backbone"
    def to_plain(t):
        if isinstance(t, dict) or hasattr(t, "items"):
            return {k: to_plain(v) for k, v in t.items()}
        return t

    new_params = to_plain(params)
    stats = {}
    _convert_maxvit_backbone(new_params, stats, sd, prefix=prefix,
                             jprefix="backbone")
    return new_params


# ---------------------------------------------------------------------------
# DAEFormer (2D/networks/DAEFormer.py) — name-mirrored conversion
# ---------------------------------------------------------------------------

def convert_daeformer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Build {"params": ...} for models.daeformer.DAEFormer from a
    reference DAEFormer state_dict (2D/networks/DAEFormer.py).

    The flax module tree mirrors the torch names, so conversion is a
    name walk: `blockK.N` → `blockK_N`, 1-D `weight` → `scale`
    (LayerNorm), conv OIHW → HWIO, linear (out,in) → (in,out).
    Dead reference params are skipped: MixFFN_skip allocates
    norm2/norm3 it never calls (segformer.py:206-220).
    """
    sd = _strip_prefix(sd)
    params: dict = {}
    for key, v in sd.items():
        _daeformer_walk_key(params, key, v)
    return {"params": params}


def _daeformer_walk_key(params: dict, key: str, v) -> None:
    """The DAEFormer generic key transform (see convert_daeformer):
    used for the MiT backbone and for every DAEFormer-style decoder
    stack (DAEFormer, DAE-LKA, BiDAEFormer)."""
    parts = key.split(".")
    # skip MixFFN_skip dead norms
    if (len(parts) >= 3 and parts[-2] in ("norm2", "norm3")
            and parts[-3] in ("mlp", "mlp1", "mlp2")):
        return
    out_parts = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if (re.fullmatch(r"block[0-9]", p)
                and i + 1 < len(parts) and parts[i + 1].isdigit()):
            out_parts.append(f"{p}_{parts[i + 1]}")
            i += 2
            continue
        out_parts.append(p)
        i += 1
    arr = np.asarray(v)
    if arr.ndim == 1 and out_parts[-1] == "weight":
        out_parts[-1] = "scale"
    elif arr.ndim == 4:
        arr = arr.transpose(2, 3, 1, 0)
    elif arr.ndim == 2:
        arr = arr.T
    _set(params, "/".join(out_parts), arr)


# ---------------------------------------------------------------------------
# SwinUNet (2D/networks/swinunet.py SwinTransformerSys)
# ---------------------------------------------------------------------------

def convert_swinunet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Build {"params": ...} for models.swinunet.SwinUNet from a
    reference SwinTransformerSys state_dict.

    Mapping (reference module → flax name):
      patch_embed.proj/.norm → patch_embed / embed_norm
      layers.s.blocks.b      → enc{s}_b{b}
      layers.s.downsample    → merge{s}
      layers_up.0            → expand2 (the bottleneck PatchExpand)
      layers_up.i>0.blocks.b → dec{3-i}_b{b}; .upsample → expand{2-i}
      concat_back_dim.i      → concat_linear{3-i}
      norm / norm_up / up / output → norm / norm_up / final_expand /
      output (bias-free 1×1 conv → kernel)
    Buffers (relative_position_index, attn_mask) are recomputed by the
    flax module and skipped here.
    """
    sd = _strip_prefix(sd)
    params: dict = {}

    def put(jpath, key, kind):
        arr = np.asarray(sd[key])
        if kind == "linear":
            arr = arr.T
        elif kind == "conv":
            arr = arr.transpose(2, 3, 1, 0)
        _set(params, jpath, arr)

    def norm(jpath, tkey):
        _set(params, f"{jpath}/scale", sd[f"{tkey}.weight"])
        _set(params, f"{jpath}/bias", sd[f"{tkey}.bias"])

    def swin_block(jp, tp):
        norm(f"{jp}/norm1", f"{tp}.norm1")
        norm(f"{jp}/norm2", f"{tp}.norm2")
        _set(params, f"{jp}/attn/relative_position_bias_table",
             sd[f"{tp}.attn.relative_position_bias_table"])
        put(f"{jp}/attn/qkv/weight", f"{tp}.attn.qkv.weight", "linear")
        put(f"{jp}/attn/qkv/bias", f"{tp}.attn.qkv.bias", "none")
        put(f"{jp}/attn/proj/weight", f"{tp}.attn.proj.weight", "linear")
        put(f"{jp}/attn/proj/bias", f"{tp}.attn.proj.bias", "none")
        put(f"{jp}/fc1/weight", f"{tp}.mlp.fc1.weight", "linear")
        put(f"{jp}/fc1/bias", f"{tp}.mlp.fc1.bias", "none")
        put(f"{jp}/fc2/weight", f"{tp}.mlp.fc2.weight", "linear")
        put(f"{jp}/fc2/bias", f"{tp}.mlp.fc2.bias", "none")

    put("patch_embed/kernel", "patch_embed.proj.weight", "conv")
    put("patch_embed/bias", "patch_embed.proj.bias", "none")
    norm("embed_norm", "patch_embed.norm")

    depths = [0, 0, 0, 0]
    for s in range(4):
        b = 0
        while f"layers.{s}.blocks.{b}.norm1.weight" in sd:
            swin_block(f"enc{s}_b{b}", f"layers.{s}.blocks.{b}")
            b += 1
        depths[s] = b
        if f"layers.{s}.downsample.reduction.weight" in sd:
            put(f"merge{s}/reduction/weight",
                f"layers.{s}.downsample.reduction.weight", "linear")
            norm(f"merge{s}/norm", f"layers.{s}.downsample.norm")

    # bottleneck expand
    put("expand2/expand/weight", "layers_up.0.expand.weight", "linear")
    norm("expand2/norm", "layers_up.0.norm")
    for i in (1, 2, 3):
        dec = 3 - i
        b = 0
        while f"layers_up.{i}.blocks.{b}.norm1.weight" in sd:
            swin_block(f"dec{dec}_b{b}", f"layers_up.{i}.blocks.{b}")
            b += 1
        if f"layers_up.{i}.upsample.expand.weight" in sd:
            put(f"expand{dec - 1}/expand/weight",
                f"layers_up.{i}.upsample.expand.weight", "linear")
            norm(f"expand{dec - 1}/norm", f"layers_up.{i}.upsample.norm")
        put(f"concat_linear{dec}/weight",
            f"concat_back_dim.{i}.weight", "linear")
        put(f"concat_linear{dec}/bias",
            f"concat_back_dim.{i}.bias", "none")

    norm("norm", "norm")
    norm("norm_up", "norm_up")
    put("final_expand/expand/weight", "up.expand.weight", "linear")
    norm("final_expand/norm", "up.norm")
    put("output/kernel", "output.weight", "conv")
    return {"params": params}


# ---------------------------------------------------------------------------
# MViT-LKA (2D/networks/mvit_LKA_Decoder.py MViTLKAFormer)
# ---------------------------------------------------------------------------

def convert_mvitlka(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert an MViTLKAFormer state_dict to models.mvit.MViTLKAFormer
    variables.

    Decoders via _convert_lka_decoders(deformable=False). Backbone
    (mvit_model_object_4out.py MViT): blocks.N → block{N};
    attn.{pool,norm}_{q,k,v} → attn/{q,k,v}_pool/{pool,norm};
    mlp.fcX → mlp_fcX; rel_pos_{h,w} pass through unchanged."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}
    _convert_lka_decoders(params, stats, sd, deformable=False)

    for key, v in sd.items():
        if not key.startswith("backbone."):
            continue
        parts = key.split(".")[1:]
        arr = np.asarray(v)
        leaf = parts[-1]
        if parts[0] == "patch_embed":
            kind = "conv" if leaf == "weight" else "none"
            _set(params, f"backbone/patch_embed/{leaf}",
                 convert_tensor(key, arr, kind))
        elif parts[0].startswith("scale") and parts[0].endswith("_norm"):
            _set(params, f"backbone/{parts[0]}/"
                 + ("scale" if leaf == "weight" else "bias"), arr)
        elif parts[0] == "blocks":
            base = f"backbone/block{parts[1]}"
            sub = parts[2]
            if sub in ("norm1", "norm2"):
                _set(params, f"{base}/{sub}/"
                     + ("scale" if leaf == "weight" else "bias"), arr)
            elif sub == "proj":
                _set(params, f"{base}/proj/{leaf}",
                     convert_tensor(key, arr,
                                    "linear" if leaf == "weight" else
                                    "none"))
            elif sub == "mlp":
                _set(params, f"{base}/mlp_{parts[3]}/{leaf}",
                     convert_tensor(key, arr,
                                    "linear" if leaf == "weight" else
                                    "none"))
            elif sub == "attn":
                name = parts[3]
                if name in ("rel_pos_h", "rel_pos_w"):
                    _set(params, f"{base}/attn/{name}", arr)
                elif name.startswith("pool_"):
                    _set(params, f"{base}/attn/{name[5:]}_pool/pool/weight",
                         convert_tensor(key, arr, "conv"))
                elif name.startswith("norm_"):
                    _set(params, f"{base}/attn/{name[5:]}_pool/norm/"
                         + ("scale" if leaf == "weight" else "bias"), arr)
                else:  # qkv / proj linears
                    _set(params, f"{base}/attn/{name}/{leaf}",
                         convert_tensor(key, arr,
                                        "linear" if leaf == "weight"
                                        else "none"))
    return {"params": params}


# ---------------------------------------------------------------------------
# BiDAEFormer (2D/networks/BiEncoderDAEDecoder.py)
# ---------------------------------------------------------------------------

def convert_bidae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a BiDAEFormer state_dict to models.biformer.BiDAEFormer
    variables.

    Decoders are DAEFormer-style (live cross_attn + DualTransformerBlock
    pairs) → the generic DAEFormer walk. Backbone (BiFormer_mm):
    downsample_layers.0.[0,1,3,4] → stem_conv1/bn1/conv2/bn2 (+ BN
    running stats to batch_stats); downsample_layers.i → down{i}_conv/bn;
    stages.s.i → stage{s}_blk{i} with attn.qkv.qkv (QKVLinear) and the
    plain attn.qkv of AttentionLePE both → attn/qkv; mlp.[0,3] →
    fc1/fc2; extra_norms.i → extra_norm{i}."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}

    def put_bn(tgt, leaf, arr):
        if leaf in ("weight", "bias"):
            _set(params, f"{tgt}/" + ("scale" if leaf == "weight"
                                      else "bias"), arr)
        elif leaf == "running_mean":
            _set(stats, f"{tgt}/mean", arr)
        elif leaf == "running_var":
            _set(stats, f"{tgt}/var", arr)

    for key, v in sd.items():
        arr = np.asarray(v)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if not key.startswith("backbone."):
            _daeformer_walk_key(params, key, v)
            continue
        bp = parts[1:]
        if bp[0] == "downsample_layers":
            i, idx = int(bp[1]), bp[2]
            if i == 0:
                name = {"0": "stem_conv1", "1": "stem_bn1",
                        "3": "stem_conv2", "4": "stem_bn2"}[idx]
            else:
                name = {"0": f"down{i}_conv", "1": f"down{i}_bn"}[idx]
            tgt = f"backbone/{name}"
            if "bn" in name:
                put_bn(tgt, leaf, arr)
            else:
                _set(params, f"{tgt}/{leaf}", convert_tensor(
                    key, arr, "conv" if leaf == "weight" else "none"))
        elif bp[0] == "extra_norms":
            _set(params, f"backbone/extra_norm{bp[1]}/"
                 + ("scale" if leaf == "weight" else "bias"), arr)
        elif bp[0] == "stages":
            base = f"backbone/stage{bp[1]}_blk{bp[2]}"
            sub = bp[3]
            if sub in ("norm1", "norm2"):
                _set(params, f"{base}/{sub}/"
                     + ("scale" if leaf == "weight" else "bias"), arr)
            elif sub == "pos_embed":
                _set(params, f"{base}/pos_embed/{leaf}", convert_tensor(
                    key, arr, "conv" if leaf == "weight" else "none"))
            elif sub == "mlp":
                fc = "fc1" if bp[4] == "0" else "fc2"
                _set(params, f"{base}/{fc}/{leaf}", convert_tensor(
                    key, arr, "linear" if leaf == "weight" else "none"))
            elif sub == "attn":
                nm = bp[4]
                if nm == "lepe":
                    _set(params, f"{base}/attn/lepe/{leaf}",
                         convert_tensor(key, arr, "conv"
                                        if leaf == "weight" else "none"))
                elif nm == "qkv":  # QKVLinear wrapper or plain Linear
                    _set(params, f"{base}/attn/qkv/{leaf}",
                         convert_tensor(key, arr, "linear"
                                        if leaf == "weight" else "none"))
                else:  # wo / proj
                    _set(params, f"{base}/attn/{nm}/{leaf}",
                         convert_tensor(key, arr, "linear"
                                        if leaf == "weight" else "none"))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# STViT-LKA (2D/networks/STViTEncoder_LKADecoder.py STVitLKA)
# ---------------------------------------------------------------------------

def _put_bn(params, stats, tgt, leaf, arr):
    if leaf in ("weight", "bias"):
        _set(params, f"{tgt}/" + ("scale" if leaf == "weight"
                                  else "bias"), arr)
    elif leaf == "running_mean":
        _set(stats, f"{tgt}/mean", arr)
    elif leaf == "running_var":
        _set(stats, f"{tgt}/var", arr)


def _stvit_block_leaf(params, base, rest, arr, key):
    """Common Swin/STViT block-internals mapping (norm1/norm2,
    layer_scale, mlp.fcX, attn q/kv/qkv/proj + rel-pos table)."""
    leaf = rest[-1]
    if rest[0] in ("norm1", "norm2"):
        _set(params, f"{base}/{rest[0]}/"
             + ("scale" if leaf == "weight" else "bias"), arr)
    elif rest[0] in ("layer_scale_1", "layer_scale_2"):
        _set(params, f"{base}/{rest[0]}", arr)
    elif rest[0] == "mlp":
        _set(params, f"{base}/{rest[1]}/{leaf}", convert_tensor(
            key, arr, "linear" if leaf == "weight" else "none"))
    elif rest[0] == "attn":
        nm = rest[1]
        if nm == "relative_position_bias_table":
            _set(params, f"{base}/attn/{nm}", arr)
        elif nm == "relative_position_index":
            pass
        else:  # q / kv / qkv / proj linears
            _set(params, f"{base}/attn/{nm}/{leaf}", convert_tensor(
                key, arr, "linear" if leaf == "weight" else "none"))


def convert_stvitlka(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert an STVitLKA state_dict to models.stvit.STVitLKA variables.

    Decoders via _convert_lka_decoders(deformable=False). Backbone
    (SwinTransformer :616-855): patch_embed.proj.{0,1}.{c,bn} →
    stem_conv/bn pairs; layers.L.blocks.i → stage{L}_blk{i} for the
    Swin stages (L ∈ 0,1,3) and stage2/blk{i} for the Deit super-token
    stage; downsample.{reduction,norm} → downsample{L}; norm{K} kept.
    relative_position_index buffers are compile-time constants here."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}
    _convert_lka_decoders(params, stats, sd, deformable=False)

    def put_bn(tgt, leaf, arr):
        _put_bn(params, stats, tgt, leaf, arr)

    def block_leaf(base, rest, arr, key):
        _stvit_block_leaf(params, base, rest, arr, key)

    for key, v in sd.items():
        if not key.startswith("backbone."):
            continue
        parts = key.split(".")[1:]
        arr = np.asarray(v)
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "patch_embed":
            # proj Sequential: [ConvBN, hardswish, ConvBN] → indices 0, 2
            i = 1 if parts[2] == "0" else 2
            if parts[3] == "c":
                _set(params, f"backbone/stem_conv{i}/weight",
                     convert_tensor(key, arr, "conv"))
            else:
                put_bn(f"backbone/stem_bn{i}", leaf, arr)
        elif parts[0].startswith("norm"):
            _set(params, f"backbone/{parts[0]}/"
                 + ("scale" if leaf == "weight" else "bias"), arr)
        elif parts[0] == "layers":
            L = parts[1]
            if parts[2] == "downsample":
                if parts[3] == "reduction":
                    _set(params, f"backbone/downsample{L}/reduction/weight",
                         convert_tensor(key, arr, "linear"))
                else:
                    _set(params, f"backbone/downsample{L}/norm/"
                         + ("scale" if leaf == "weight" else "bias"), arr)
            elif parts[2] == "blocks":
                i = parts[3]
                base = (f"backbone/stage2/blk{i}" if L == "2"
                        else f"backbone/stage{L}_blk{i}")
                block_leaf(base, parts[4:], arr, key)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# HiFormer (2D/skin_code/model/hiformer/)
# ---------------------------------------------------------------------------

def convert_hiformer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a HiFormer state_dict to models.hiformer.HiFormer
    variables (reference_exact=True semantics: the shipped configs have
    depth[-1]=0 so no fusion CrossAttentionBlocks exist, and the branch
    ViT `blocks` params are dead — both are skipped here).

    Key map: All2Cross.pyramid.resnet_layers.[0,1,4,5,6] →
    root_conv/root_bn/layer1..3; swin_transformer.layers.L.blocks.i →
    pyramid/swin{L}_{i}; p{k}_ch/p{k}_pm/norm_{k} kept;
    All2Cross.pos_embed.i → pos_embed_{i}; blocks.b.{projs,revert_projs}
    → dlf{b}/{proj,revert}{d}_{norm,linear}; norm.i → norm{i};
    ConvUp_{l,s}.convs_level.[conv,gn strides] → convup_{l,s}; conv_pred
    / segmentation_head Sequential index 0."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}

    def norm_leaf(p):
        return "scale" if p == "weight" else "bias"

    def put_bn(tgt, leaf, arr):
        if leaf in ("weight", "bias"):
            _set(params, f"{tgt}/{norm_leaf(leaf)}", arr)
        elif leaf == "running_mean":
            _set(stats, f"{tgt}/mean", arr)
        elif leaf == "running_var":
            _set(stats, f"{tgt}/var", arr)

    def basic_block(base, rest, arr, key):
        leaf = rest[-1]
        if rest[0] in ("conv1", "conv2"):
            _set(params, f"{base}/{rest[0]}/weight",
                 convert_tensor(key, arr, "conv"))
        elif rest[0] in ("bn1", "bn2"):
            put_bn(f"{base}/{rest[0]}", leaf, arr)
        elif rest[0] == "downsample":
            if rest[1] == "0":
                _set(params, f"{base}/down_conv/weight",
                     convert_tensor(key, arr, "conv"))
            else:
                put_bn(f"{base}/down_bn", leaf, arr)

    def swin_block(base, rest, arr, key):
        leaf = rest[-1]
        if rest[0] in ("norm1", "norm2"):
            _set(params, f"{base}/{rest[0]}/{norm_leaf(leaf)}", arr)
        elif rest[0] == "mlp":
            _set(params, f"{base}/{rest[1]}/{leaf}", convert_tensor(
                key, arr, "linear" if leaf == "weight" else "none"))
        elif rest[0] == "attn":
            if rest[1] == "relative_position_bias_table":
                _set(params, f"{base}/attn/{rest[1]}", arr)
            elif rest[1] != "relative_position_index":
                _set(params, f"{base}/attn/{rest[1]}/{leaf}",
                     convert_tensor(key, arr, "linear"
                                    if leaf == "weight" else "none"))

    for key, v in sd.items():
        parts = key.split(".")
        arr = np.asarray(v)
        leaf = parts[-1]
        if leaf in ("num_batches_tracked", "attn_mask"):
            continue
        if parts[0] == "All2Cross":
            p = parts[1:]
            if p[0] == "pos_embed":
                _set(params, f"pos_embed_{p[1]}", arr)
            elif p[0] == "norm":
                _set(params, f"norm{p[1]}/{norm_leaf(leaf)}", arr)
            elif p[0] == "blocks":
                base = f"dlf{p[1]}"
                if p[2] == "projs":
                    d, idx = p[3], p[4]
                    if idx == "0":
                        _set(params, f"{base}/proj{d}_norm/"
                             + norm_leaf(leaf), arr)
                    else:
                        _set(params, f"{base}/proj{d}_linear/{leaf}",
                             convert_tensor(key, arr, "linear"
                                            if leaf == "weight"
                                            else "none"))
                elif p[2] == "revert_projs":
                    d, idx = p[3], p[4]
                    if idx == "0":
                        _set(params, f"{base}/revert{d}_norm/"
                             + norm_leaf(leaf), arr)
                    else:
                        _set(params, f"{base}/revert{d}_linear/{leaf}",
                             convert_tensor(key, arr, "linear"
                                            if leaf == "weight"
                                            else "none"))
                # fusion.* / blocks.* are dead at the shipped configs
            elif p[0] == "pyramid":
                q = p[1:]
                if q[0] == "resnet_layers":
                    i = q[1]
                    if i == "0":
                        _set(params, "pyramid/root_conv/weight",
                             convert_tensor(key, arr, "conv"))
                    elif i == "1":
                        put_bn("pyramid/root_bn", leaf, arr)
                    elif i in ("4", "5", "6"):
                        layer = f"layer{int(i) - 3}"
                        basic_block(
                            f"pyramid/{layer}/block{q[2]}", q[3:], arr,
                            key)
                elif q[0] == "swin_transformer":
                    base = f"pyramid/swin{q[2]}_{q[4]}"
                    swin_block(base, q[5:], arr, key)
                elif q[0] in ("p1_ch", "p2_ch", "p3_ch"):
                    _set(params, f"pyramid/{q[0]}/{leaf}", convert_tensor(
                        key, arr, "conv" if leaf == "weight" else "none"))
                elif q[0] in ("p1_pm", "p2_pm"):
                    if q[1] == "reduction":
                        _set(params, f"pyramid/{q[0]}/reduction/weight",
                             convert_tensor(key, arr, "linear"))
                    else:
                        _set(params, f"pyramid/{q[0]}/norm/"
                             + norm_leaf(leaf), arr)
                elif q[0] in ("norm_1", "norm_2"):
                    _set(params, f"pyramid/{q[0]}/{norm_leaf(leaf)}", arr)
        elif parts[0] in ("ConvUp_l", "ConvUp_s"):
            if parts[1] != "convs_level":
                continue  # conv_tower aliases convs_level
            tgt = "convup_l" if parts[0] == "ConvUp_l" else "convup_s"
            idx = int(parts[2])
            step = 4 if parts[0] == "ConvUp_s" else 3
            lvl, off = divmod(idx, step)
            if off == 0:
                _set(params, f"{tgt}/conv{lvl}/weight",
                     convert_tensor(key, arr, "conv"))
            else:
                _set(params, f"{tgt}/gn{lvl}/{norm_leaf(leaf)}", arr)
        elif parts[0] == "conv_pred":
            _set(params, f"conv_pred/{leaf}", convert_tensor(
                key, arr, "conv" if leaf == "weight" else "none"))
        elif parts[0] == "segmentation_head":
            _set(params, f"segmentation_head/{leaf}", convert_tensor(
                key, arr, "conv" if leaf == "weight" else "none"))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# TransUNet / TransNorm (2D/skin_code/model/vit_seg_modeling.py)
# ---------------------------------------------------------------------------

def convert_transunet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a skin TransUNet (TransNorm variant) state_dict to
    models.transunet.TransUNet variables.

    transformer.embeddings.hybrid_model → hybrid_model (ResNetV2:
    root conv/gn, body.blockB.unitU → blockB_unitU with
    downsample/gn_proj); encoder.layer.i → block{i} (q/k/v/spatial/out
    linears, ffn.fcX → fcX); decoder Conv2dReLU Sequentials [conv,bn] →
    conv+bn (+ running stats); chatt.fc.[0,2] → chatt/fc{1,2}."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}

    def norm_leaf(p):
        return "scale" if p == "weight" else "bias"

    def put_bn(tgt, leaf, arr):
        if leaf in ("weight", "bias"):
            _set(params, f"{tgt}/{norm_leaf(leaf)}", arr)
        elif leaf == "running_mean":
            _set(stats, f"{tgt}/mean", arr)
        elif leaf == "running_var":
            _set(stats, f"{tgt}/var", arr)

    def conv_relu(tgt, idx, leaf, arr, key):
        if idx == "0":
            _set(params, f"{tgt}/conv/weight",
                 convert_tensor(key, arr, "conv"))
        else:
            put_bn(f"{tgt}/bn", leaf, arr)

    for key, v in sd.items():
        parts = key.split(".")
        arr = np.asarray(v)
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "transformer":
            p = parts[1:]
            if p[0] == "embeddings":
                if p[1] == "hybrid_model":
                    q = p[2:]
                    if q[0] == "root":
                        if q[1] == "conv":
                            _set(params, "hybrid_model/root_conv/weight",
                                 convert_tensor(key, arr, "conv"))
                        else:
                            _set(params, "hybrid_model/root_gn/"
                                 + norm_leaf(leaf), arr)
                    elif q[0] == "body":
                        base = f"hybrid_model/{q[1]}_{q[2]}"
                        nm = q[3]
                        if nm.startswith("conv") or nm == "downsample":
                            _set(params, f"{base}/{nm}/weight",
                                 convert_tensor(key, arr, "conv"))
                        else:  # gn1/2/3 / gn_proj
                            _set(params, f"{base}/{nm}/"
                                 + norm_leaf(leaf), arr)
                elif p[1] == "patch_embeddings":
                    _set(params, f"patch_embeddings/{leaf}",
                         convert_tensor(key, arr,
                                        "conv" if leaf == "weight"
                                        else "none"))
                elif p[1] == "position_embeddings":
                    _set(params, "position_embeddings", arr)
            elif p[0] == "encoder":
                if p[1] == "encoder_norm":
                    _set(params, f"encoder_norm/{norm_leaf(leaf)}", arr)
                elif p[1] == "layer":
                    base = f"block{p[2]}"
                    nm = p[3]
                    if nm in ("attention_norm", "ffn_norm"):
                        _set(params, f"{base}/{nm}/{norm_leaf(leaf)}",
                             arr)
                    elif nm == "attn":
                        _set(params, f"{base}/attn/{p[4]}/{leaf}",
                             convert_tensor(key, arr, "linear"
                                            if leaf == "weight"
                                            else "none"))
                    elif nm == "ffn":
                        _set(params, f"{base}/{p[4]}/{leaf}",
                             convert_tensor(key, arr, "linear"
                                            if leaf == "weight"
                                            else "none"))
        elif parts[0] == "decoder":
            if parts[1] in ("conv_more", "conv_att"):
                conv_relu(parts[1], parts[2], leaf, arr, key)
            elif parts[1] == "blocks":
                base = f"decoder{parts[2]}"
                nm = parts[3]
                if nm in ("conv1", "conv2", "convatt"):
                    conv_relu(f"{base}/{nm}", parts[4], leaf, arr, key)
                elif nm == "chatt":
                    fc = "fc1" if parts[5] == "0" else "fc2"
                    _set(params, f"{base}/chatt/{fc}/weight",
                         convert_tensor(key, arr, "conv"))
        elif parts[0] == "segmentation_head":
            _set(params, f"segmentation_head/{leaf}", convert_tensor(
                key, arr, "conv" if leaf == "weight" else "none"))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# DAE-LKA (2D/networks/DAEEncoder_LKADecoder.py DAELKAFormer)
# ---------------------------------------------------------------------------

def convert_daelka(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a DAELKAFormer state_dict to models.dae_lka.DAELKAFormer
    variables: DAEFormer MiT backbone via the generic walk; the LKA
    decoder stack (add-fusion, double layer_lka_1) via
    _convert_lka_decoders(deformable=False)."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}
    _convert_lka_decoders(params, stats, sd, deformable=False)
    for key, v in sd.items():
        if key.startswith("backbone."):
            _daeformer_walk_key(params, key, v)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Generic nnU-Net (3D/d_lka_former/network_architecture/generic_UNet.py)
# ---------------------------------------------------------------------------

def convert_generic_unet(sd: Dict[str, np.ndarray],
                         num_pool: int) -> Dict[str, Any]:
    """Convert a Generic_UNet state_dict to models.generic_unet
    variables.

    conv_blocks_context.s → down{s} (s<num_pool) / bottleneck (the last
    context entry is Sequential(StackedConvLayers, StackedConvLayers) →
    block0/block1); decoder entries are built deepest-first in torch, so
    tu.j / conv_blocks_localization.j / seg_outputs.j map to
    up/dec/seg{num_pool-1-j}. Our convs are flax nn.Conv (leaf
    `kernel`)."""
    sd = _strip_prefix(sd)
    params: dict = {}

    def put_leaf(base, mod, leaf, arr, key):
        """ConvDropoutNormNonlin leaves: conv.{weight,bias} /
        instnorm.{weight,bias}."""
        if mod == "conv":
            _set(params,
                 f"{base}/conv/" + ("kernel" if leaf == "weight"
                                    else "bias"),
                 convert_tensor(key, arr,
                                "conv" if leaf == "weight" else "none"))
        else:
            _set(params, f"{base}/norm/"
                 + ("scale" if leaf == "weight" else "bias"), arr)

    def stacked_pair_block(prefix, sub, bidx):
        """Sequential(StackedConvLayers(n-1), StackedConvLayers(1)) →
        flat block index (bottleneck + localization stages)."""
        if sub == 0:
            return bidx
        n0 = 0
        while f"{prefix}.0.blocks.{n0}.conv.weight" in sd:
            n0 += 1
        return n0 + bidx

    for key, v in sd.items():
        parts = key.split(".")
        arr = np.asarray(v)
        leaf = parts[-1]
        if parts[0] == "conv_blocks_context":
            s = int(parts[1])
            if s < num_pool:
                # context.s.blocks.i.{conv,instnorm}
                put_leaf(f"down{s}/block{parts[3]}", parts[4], leaf, arr,
                         key)
            else:
                # context.last.{sub}.blocks.{i}.{conv,instnorm}
                blk = stacked_pair_block(f"conv_blocks_context.{s}",
                                         int(parts[2]), int(parts[4]))
                put_leaf(f"bottleneck/block{blk}", parts[5], leaf, arr,
                         key)
        elif parts[0] == "conv_blocks_localization":
            j = int(parts[1])
            s = num_pool - 1 - j
            blk = stacked_pair_block(f"conv_blocks_localization.{j}",
                                     int(parts[2]), int(parts[4]))
            put_leaf(f"dec{s}/block{blk}", parts[5], leaf, arr, key)
        elif parts[0] == "tu":
            j = int(parts[1])
            s = num_pool - 1 - j
            # flax nn.ConvTranspose correlates with the kernel as-is,
            # torch conv_transpose convolves → flip the spatial axes
            w = convert_tensor(key, arr, "conv_transpose")
            nd = w.ndim - 2
            w = w[tuple(slice(None, None, -1) for _ in range(nd))].copy()
            _set(params, f"up{s}/kernel", w)
        elif parts[0] == "seg_outputs":
            j = int(parts[1])
            s = num_pool - 1 - j
            _set(params, f"seg{s}/kernel",
                 convert_tensor(key, arr, "conv"))
    return {"params": params}


# ---------------------------------------------------------------------------
# Pancreas VNet (3D/pancreas_code/networks/vnet.py)
# ---------------------------------------------------------------------------

def convert_resnet34(sd: Dict[str, np.ndarray],
                     normalization: str = "none") -> Dict[str, Any]:
    """Convert a pancreas Resnet34 state_dict (ResNet34.py:184-240 with
    the resnet.py:222 resnet34 encoder) to models.pancreas_baselines
    .Resnet34Seg variables. Encoder convs are layers.Conv3d ("weight",
    (*k, I, O)); decoder blocks share the VNet ConvBlock/UpBlock family
    (flax "kernel", deconv kernels spatially flipped)."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}

    def put_bn(tgt, leaf, arr):
        if leaf == "weight":
            _set(params, f"{tgt}/scale", arr)
        elif leaf == "bias":
            _set(params, f"{tgt}/bias", arr)
        elif leaf == "running_mean":
            _set(stats, f"{tgt}/mean", arr)
        elif leaf == "running_var":
            _set(stats, f"{tgt}/var", arr)

    enc, dec = {}, {}
    for key, v in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        (enc if key.startswith("resnet_encoder.") else dec)[key] = v

    for key, v in enc.items():
        parts = key.split(".")[1:]  # drop resnet_encoder
        arr = np.asarray(v)
        leaf = parts[-1]
        if parts[0] == "conv1":
            _set(params, "resnet_encoder/conv1/weight",
                 convert_tensor(key, arr, "conv"))
        elif parts[0] == "bn1":
            put_bn("resnet_encoder/bn1", leaf, arr)
        else:  # layer{L}.{i}.<module>...
            layer, idx, mod = parts[0], parts[1], parts[2]
            base = f"resnet_encoder/{layer}_{idx}"
            if mod == "downsample":
                if parts[3] == "0":
                    _set(params, f"{base}/downsample_conv/weight",
                         convert_tensor(key, arr, "conv"))
                else:
                    put_bn(f"{base}/downsample_bn", leaf, arr)
            elif mod.startswith("conv"):
                _set(params, f"{base}/{mod}/weight",
                     convert_tensor(key, arr, "conv"))
            else:  # bn1 / bn2
                put_bn(f"{base}/{mod}", leaf, arr)

    step = 3 if normalization != "none" else 2
    for key, v in dec.items():
        parts = key.split(".")
        arr = np.asarray(v)
        leaf = parts[-1]
        if parts[0] == "out_conv":
            _set(params, f"out_conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 convert_tensor(key, arr,
                                "conv" if leaf == "weight" else "none"))
            continue
        block, idx = parts[0], int(parts[2])
        if block.endswith("_up"):
            if idx == 0:
                if leaf == "weight":
                    w = convert_tensor(key, arr, "conv_transpose")
                    w = w[(slice(None, None, -1),) * (w.ndim - 2)]
                    _set(params, f"{block}/conv/kernel", w.copy())
                else:
                    _set(params, f"{block}/conv/bias", arr)
            else:
                put_bn(f"{block}/norm", leaf, arr)
        else:
            stage, off = divmod(idx, step)
            if off == 0:
                _set(params, f"{block}/conv{stage}/"
                     + ("kernel" if leaf == "weight" else "bias"),
                     convert_tensor(key, arr,
                                    "conv" if leaf == "weight" else "none"))
            else:
                put_bn(f"{block}/norm{stage}", leaf, arr)
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_vnet(sd: Dict[str, np.ndarray],
                 normalization: str = "batchnorm") -> Dict[str, Any]:
    """Convert a vnet.py VNet state_dict to models.pancreas_baselines
    .VNet variables. Sequential stride per stage is 3 with a norm
    ([conv, norm, relu]) and 2 without; up-block deconv kernels are
    spatially flipped for flax ConvTranspose."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}
    step = 3 if normalization != "none" else 2

    def put_norm_leaf(tgt, leaf, arr):
        if leaf in ("weight", "bias"):
            _set(params, f"{tgt}/" + ("scale" if leaf == "weight"
                                      else "bias"), arr)
        elif leaf == "running_mean":
            _set(stats, f"{tgt}/mean", arr)
        elif leaf == "running_var":
            _set(stats, f"{tgt}/var", arr)

    for key, v in sd.items():
        parts = key.split(".")
        arr = np.asarray(v)
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "out_conv":
            _set(params, f"out_conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 convert_tensor(key, arr,
                                "conv" if leaf == "weight" else "none"))
            continue
        block, idx = parts[0], int(parts[2])
        is_down = block.endswith("_dw")
        is_up = block.endswith("_up")
        if is_down or is_up:
            if idx == 0:
                if leaf == "weight":
                    if is_up:
                        w = convert_tensor(key, arr, "conv_transpose")
                        w = w[(slice(None, None, -1),) * (w.ndim - 2)]
                        _set(params, f"{block}/conv/kernel", w.copy())
                    else:
                        _set(params, f"{block}/conv/kernel",
                             convert_tensor(key, arr, "conv"))
                else:
                    _set(params, f"{block}/conv/bias", arr)
            else:
                put_norm_leaf(f"{block}/norm", leaf, arr)
        else:
            stage, off = divmod(idx, step)
            if off == 0:
                _set(params, f"{block}/conv{stage}/"
                     + ("kernel" if leaf == "weight" else "bias"),
                     convert_tensor(key, arr,
                                    "conv" if leaf == "weight"
                                    else "none"))
            else:
                put_norm_leaf(f"{block}/norm{stage}", leaf, arr)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# SemanticSTViT (2D/networks/STViTSegmentation.py)
# ---------------------------------------------------------------------------

def convert_semantic_stvit(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a SemanticSTViT state_dict to
    models.stvit.SemanticSTViT variables.

    7 layers: 0,1 Swin+PatchMerging → enc{L}_blk{i}+down{L}; 2 Deit+
    PatchMerging → enc2/blk{i}+down2; 3 Swin+PatchExpand → dec3_blk{i}
    +up3; 4 Deit+PatchExpand → dec4/blk{i}+up4; 5,6 Swin+expand →
    dec{L}_blk{i}+up{L}. The per-layer out-norms (norm0..6) only feed
    the multi-output tuple the reference never returns (forward returns
    x_final only, STViTSegmentation.py:1489-1495) — skipped."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}
    layer_base = {"0": "enc0_blk", "1": "enc1_blk", "2": "enc2/blk",
                  "3": "dec3_blk", "4": "dec4_blk", "5": "dec5_blk",
                  "6": "dec6_blk"}
    updown = {"downsample": "down", "upsample": "up"}

    for key, v in sd.items():
        parts = key.split(".")
        arr = np.asarray(v)
        leaf = parts[-1]
        if leaf == "num_batches_tracked" or parts[0].startswith("norm"):
            continue
        if parts[0] == "patch_embed":
            i = 1 if parts[2] == "0" else 2
            if parts[3] == "c":
                _set(params, f"stem_conv{i}/weight",
                     convert_tensor(key, arr, "conv"))
            else:
                _put_bn(params, stats, f"stem_bn{i}", leaf, arr)
        elif parts[0] == "last_layer":
            _set(params, f"last_layer/{leaf}", convert_tensor(
                key, arr, "conv" if leaf == "weight" else "none"))
        elif parts[0] == "layers":
            L = parts[1]
            if parts[2] == "blocks":
                if L == "4" and parts[3] == "1":
                    # depth-2 Deit: blk 1's semantic token is computed
                    # and dropped (see models/stvit.SemanticSTViT) —
                    # its params are dead
                    continue
                _stvit_block_leaf(params,
                                  f"{layer_base[L]}{parts[3]}",
                                  parts[4:], arr, key)
            elif parts[2] in updown:
                tgt = f"{updown[parts[2]]}{L}"
                if parts[3] in ("reduction", "expand"):
                    _set(params, f"{tgt}/{parts[3]}/weight",
                         convert_tensor(key, arr, "linear"))
                else:
                    _set(params, f"{tgt}/norm/"
                         + ("scale" if leaf == "weight" else "bias"),
                         arr)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# SegFormer (2D/networks/segformer.py)
# ---------------------------------------------------------------------------

def convert_segformer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a segformer.py SegFormer state_dict to
    nn.segformer.SegFormer variables.

    Backbone MiT via the DAEFormer generic walk (blockK.N → blockK_N).
    Decode head: decode_head.linear_cK.proj → linear_cK;
    linear_fuse.{conv,bn} → linear_fuse + bn (running stats to
    batch_stats); linear_pred kept; the dead conv_seg (never called in
    Decoder.forward) is skipped."""
    sd = _strip_prefix(sd)
    params: dict = {}
    stats: dict = {}
    for key, v in sd.items():
        parts = key.split(".")
        arr = np.asarray(v)
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "backbone":
            _daeformer_walk_key(params, key, v)
        elif parts[0] == "decode_head":
            nm = parts[1]
            if nm.startswith("linear_c") and nm != "linear_fuse":
                _set(params, f"{nm}/{leaf}", convert_tensor(
                    key, arr, "linear" if leaf == "weight" else "none"))
            elif nm == "linear_fuse":
                if parts[2] == "conv":
                    _set(params, "linear_fuse/weight",
                         convert_tensor(key, arr, "conv"))
                elif parts[2] == "bn":
                    _put_bn(params, stats, "bn", leaf, arr)
            elif nm == "linear_pred":
                _set(params, f"linear_pred/{leaf}", convert_tensor(
                    key, arr, "conv" if leaf == "weight" else "none"))
            # conv_seg: dead
    return {"params": params, "batch_stats": stats}


def convert_unetr(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """UNETR (pancreas unetr.py:22-229 / MONAI 0.7) state dict →
    models.pancreas_baselines.UNETR variables. Instance norms are
    affine=False (no params); only convs/linears/layernorms map."""
    sd = _strip_prefix(sd)
    params: dict = {}

    def put(path, key, kind):
        if key not in sd:
            return False
        _set(params, path, convert_tensor(key, sd[key], kind))
        return True

    def put_ln(path, tkey):
        _set(params, f"{path}/scale", sd[f"{tkey}.weight"])
        _set(params, f"{path}/bias", sd[f"{tkey}.bias"])

    def conv_block(jpath, tkey):
        put(f"{jpath}/weight", f"{tkey}.conv.weight", "conv")
        put(f"{jpath}/bias", f"{tkey}.conv.bias", "none")

    def unet_res_block(jpath, tkey):
        conv_block(f"{jpath}/conv1", f"{tkey}.conv1")
        conv_block(f"{jpath}/conv2", f"{tkey}.conv2")
        if f"{tkey}.conv3.conv.weight" in sd:
            conv_block(f"{jpath}/conv3", f"{tkey}.conv3")

    # ViT
    put("patch_embed/weight", "vit.patch_embedding.patch_embeddings.1.weight",
        "linear")
    put("patch_embed/bias", "vit.patch_embedding.patch_embeddings.1.bias",
        "none")
    _set(params, "position_embeddings",
         sd["vit.patch_embedding.position_embeddings"])
    i = 0
    while f"vit.blocks.{i}.norm1.weight" in sd:
        j = f"vit_block_{i}"
        t = f"vit.blocks.{i}"
        put_ln(f"{j}/norm1", f"{t}.norm1")
        put(f"{j}/attn/qkv/weight", f"{t}.attn.qkv.weight", "linear")
        put(f"{j}/attn/out_proj/weight", f"{t}.attn.out_proj.weight",
            "linear")
        put(f"{j}/attn/out_proj/bias", f"{t}.attn.out_proj.bias", "none")
        put_ln(f"{j}/norm2", f"{t}.norm2")
        put(f"{j}/mlp_fc1/weight", f"{t}.mlp.linear1.weight", "linear")
        put(f"{j}/mlp_fc1/bias", f"{t}.mlp.linear1.bias", "none")
        put(f"{j}/mlp_fc2/weight", f"{t}.mlp.linear2.weight", "linear")
        put(f"{j}/mlp_fc2/bias", f"{t}.mlp.linear2.bias", "none")
        i += 1
    put_ln("vit_norm", "vit.norm")

    # CNN encoders (UnetrBasicBlock wraps UnetResBlock under .layer)
    unet_res_block("encoder1", "encoder1.layer")
    for enc, nlayer in (("encoder2", 2), ("encoder3", 1),
                        ("encoder4", 0)):
        put(f"{enc}/transp_conv_init/weight",
            f"{enc}.transp_conv_init.conv.weight", "conv_transpose")
        for k in range(nlayer):
            put(f"{enc}/blocks_{k}/weight",
                f"{enc}.blocks.{k}.conv.weight", "conv_transpose")

    # decoders
    for dec in ("decoder5", "decoder4", "decoder3", "decoder2"):
        put(f"{dec}/transp_conv/weight", f"{dec}.transp_conv.conv.weight",
            "conv_transpose")
        unet_res_block(f"{dec}/conv_block", f"{dec}.conv_block")

    conv_block("out/conv", "out.conv")
    return {"params": params}
