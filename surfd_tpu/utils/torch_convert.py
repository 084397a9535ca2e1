"""Reference-checkpoint converters: Surf-D torch .pt → surfd_tpu param trees.

Enables true parity checks against the published PyTorch checkpoints
(SURVEY.md §7 step 5). Conversions map the reference module layouts:
  * Dgcnn encoder      (/root/reference/AutoEncoder/models/dgcnn.py:27-115)
  * CbnDecoder         (/root/reference/AutoEncoder/models/cbndec.py:4-134)
  * MDM 1-D UNet       (/root/reference/models/openaimodel.py:413-749 at the
                        mdm.py:34-57 configuration)

torch (CPU) is only needed at conversion time; outputs are plain numpy trees
loadable with utils.checkpoint.load_params_npz / usable directly.

Layout rules applied throughout:
  torch Linear weight (out, in)        → flax Dense kernel (in, out):  W.T
  torch Conv1d k=1 weight (out, in, 1) → flax Dense kernel (in, out):  W[:, :, 0].T
  torch Conv1d k=3 weight (out, in, 3) → flax Conv kernel (3, in, out): W.transpose(2, 1, 0)
  torch BatchNorm running_mean/var     → flax batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32)


def _dense(sd, prefix, bias=True):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv1x1(sd, prefix, bias=True):
    w = _np(sd[f"{prefix}.weight"])  # (out, in, 1)
    out = {"kernel": w[:, :, 0].T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _convk(sd, prefix):
    """torch Conv1d any-k (out, in, k) → flax Conv kernel (k, in, out)."""
    w = _np(sd[f"{prefix}.weight"])
    return {"kernel": w.transpose(2, 1, 0), "bias": _np(sd[f"{prefix}.bias"])}


_conv3 = _convk


def _bn(sd, prefix):
    """torch BatchNorm1d → (params affine, batch_stats)."""
    params = {}
    if f"{prefix}.weight" in sd:
        params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_dgcnn(sd: Dict) -> dict:
    """Reference Dgcnn state_dict → {'params', 'batch_stats'} for models.Dgcnn."""
    params, stats = {}, {}
    for i in range(1, 5):
        params[f"block{i}_conv"] = {"kernel": _np(sd[f"conv_{i}.weight"]).T}
        bn_p, bn_s = _bn(sd, f"bn_{i}")
        params[f"block{i}_bn"] = bn_p
        stats[f"block{i}_bn"] = bn_s
    params["head_conv"] = {"kernel": _np(sd["conv_5.weight"]).T}
    bn_p, bn_s = _bn(sd, "bn_5")
    params["head_bn"] = bn_p
    stats["head_bn"] = bn_s
    return {"params": params, "batch_stats": stats}


def convert_cbn_decoder(sd: Dict, num_hidden_layers: int = 5) -> dict:
    """Reference CbnDecoder state_dict → {'params', 'batch_stats'}.

    Reference prefix: decoder.fc_p / decoder.blocks.{i}.{bn_0,bn_1,fc_0,fc_1}
    / decoder.bn / decoder.fc_out (cbndec.py:106-134)."""
    def cbn(prefix):
        p = {
            "gamma": _conv1x1(sd, f"{prefix}.conv_gamma"),
            "beta": _conv1x1(sd, f"{prefix}.conv_beta"),
        }
        _, bn_s = _bn(sd, f"{prefix}.bn")
        return p, {"bn": bn_s}

    params = {"fc_p": _conv1x1(sd, "decoder.fc_p"), "fc_out": _conv1x1(sd, "decoder.fc_out")}
    stats = {}
    for i in range(num_hidden_layers):
        b = f"decoder.blocks.{i}"
        bn0_p, bn0_s = cbn(f"{b}.bn_0")
        bn1_p, bn1_s = cbn(f"{b}.bn_1")
        params[f"block_{i}"] = {
            "bn_0": bn0_p,
            "bn_1": bn1_p,
            "fc_0": _conv1x1(sd, f"{b}.fc_0"),
            "fc_1": _conv1x1(sd, f"{b}.fc_1"),
        }
        stats[f"block_{i}"] = {"bn_0": bn0_s, "bn_1": bn1_s}
    bno_p, bno_s = cbn("decoder.bn")
    params["bn_out"] = bno_p
    stats["bn_out"] = bno_s
    return {"params": params, "batch_stats": stats}


def convert_mdm_unet(sd: Dict, model_channels: int = 224,
                     channel_mult=(1, 2, 4, 4), num_res_blocks: int = 2) -> dict:
    """Reference MDM/UNetModel state_dict → params for models.MDM.

    Keys arrive as `Unet.*` (mdm.py:34) with guided-diffusion's sequential
    block numbering (openaimodel.py:516-692); CLIP keys are skipped (the
    reference strips them at save, training_loop_single.py:320-355).
    """
    sd = {k[len("Unet."):]: v for k, v in sd.items() if k.startswith("Unet.")} or sd

    def _groupnorm(sd_, prefix):
        # flax path: <parent>/GroupNorm32_k/GroupNorm_0/{scale,bias}
        return {
            "GroupNorm_0": {
                "scale": _np(sd_[f"{prefix}.weight"]),
                "bias": _np(sd_[f"{prefix}.bias"]),
            }
        }

    def res_params(prefix):
        return {
            "GroupNorm32_0": _groupnorm(sd, f"{prefix}.in_layers.0"),
            "in_conv": _conv3(sd, f"{prefix}.in_layers.2"),
            "emb_proj": _dense(sd, f"{prefix}.emb_layers.1"),
            "GroupNorm32_1": _groupnorm(sd, f"{prefix}.out_layers.0"),
            "out_conv": _conv3(sd, f"{prefix}.out_layers.3"),
            **(
                {"skip": _convk(sd, f"{prefix}.skip_connection")}
                if f"{prefix}.skip_connection.weight" in sd
                else {}
            ),
        }

    def attn_params(prefix):
        return {
            "GroupNorm32_0": _groupnorm(sd, f"{prefix}.norm"),
            "qkv": _convk(sd, f"{prefix}.qkv"),
            "proj_out": _convk(sd, f"{prefix}.proj_out"),
        }

    unet = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "in_conv": _conv3(sd, "input_blocks.0.0"),
        "GroupNorm32_0": _groupnorm(sd, "out.0"),
        "out_conv": _conv3(sd, "out.2"),
    }
    if "label_emb.weight" in sd:
        # Our category model reserves one extra row (MDM.null_action) as the
        # CFG unconditional class; the reference has no such row, so pad with
        # zeros (a zero embedding adds nothing to the time embedding — the
        # same effect as the reference's nulled payload, cfg_sampler.py:18-26).
        emb = _np(sd["label_emb.weight"])
        emb = np.concatenate([emb, np.zeros((1, emb.shape[1]), emb.dtype)], axis=0)
        unet["label_emb"] = {"embedding": emb}
    if "sketch_emb.weight" in sd:
        unet["context_proj"] = _dense(sd, "sketch_emb")

    # encoder blocks: sequential numbering — per level: num_res_blocks
    # entries of [ResBlock(+Attn)], then a Downsample entry (except last)
    idx = 1
    ds = 1
    attn_res = (4, 2, 1)
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            unet[f"down_{level}_{i}"] = res_params(f"input_blocks.{idx}.0")
            if ds in attn_res:
                unet[f"down_attn_{level}_{i}"] = attn_params(f"input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            unet[f"downsample_{level}"] = {"op": _conv3(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    unet["mid_res_0"] = res_params("middle_block.0")
    unet["mid_attn"] = attn_params("middle_block.1")
    unet["mid_res_1"] = res_params("middle_block.2")

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            unet[f"up_{level}_{i}"] = res_params(f"output_blocks.{idx}.0")
            pos = 1
            if ds in attn_res:
                unet[f"up_attn_{level}_{i}"] = attn_params(f"output_blocks.{idx}.{pos}")
                pos += 1
            if level and i == num_res_blocks:
                unet[f"upsample_{level}"] = {
                    "conv": _conv3(sd, f"output_blocks.{idx}.{pos}.conv")
                }
                ds //= 2
            idx += 1

    return {"params": {"unet": unet}}


def convert_encoder_unet(sd: Dict, channel_mult=(1, 2, 4, 4), num_res_blocks: int = 2,
                         attn_res=(4, 2, 1), pool: str = "attention") -> dict:
    """Reference EncoderUNetModel state_dict → params for models.EncoderUNet1D.

    Same sequential input_blocks/middle_block numbering as the full UNet
    (openaimodel.py:808-893); the head depends on `pool` (:899-930). Only the
    "attention" head is loadable from a dims=1 reference module (the adaptive/
    spatial heads crash there — see encoder_unet.py docstring), but all four
    layouts are converted for checkpoints trained with 2-D trunks.
    """

    def _groupnorm(prefix):
        return {
            "GroupNorm_0": {
                "scale": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"]),
            }
        }

    def res_params(prefix):
        return {
            "GroupNorm32_0": _groupnorm(f"{prefix}.in_layers.0"),
            "in_conv": _conv3(sd, f"{prefix}.in_layers.2"),
            "emb_proj": _dense(sd, f"{prefix}.emb_layers.1"),
            "GroupNorm32_1": _groupnorm(f"{prefix}.out_layers.0"),
            "out_conv": _conv3(sd, f"{prefix}.out_layers.3"),
            **(
                {"skip": _convk(sd, f"{prefix}.skip_connection")}
                if f"{prefix}.skip_connection.weight" in sd
                else {}
            ),
        }

    def attn_params(prefix):
        return {
            "GroupNorm32_0": _groupnorm(f"{prefix}.norm"),
            "qkv": _convk(sd, f"{prefix}.qkv"),
            "proj_out": _convk(sd, f"{prefix}.proj_out"),
        }

    net = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "in_conv": _conv3(sd, "input_blocks.0.0"),
    }
    idx, ds = 1, 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            net[f"down_{level}_{i}"] = res_params(f"input_blocks.{idx}.0")
            if ds in attn_res:
                net[f"down_attn_{level}_{i}"] = attn_params(f"input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            net[f"downsample_{level}"] = {"op": _conv3(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2
    net["mid_res_0"] = res_params("middle_block.0")
    net["mid_attn"] = attn_params("middle_block.1")
    net["mid_res_1"] = res_params("middle_block.2")

    if pool == "adaptive":
        net["GroupNorm32_0"] = _groupnorm("out.0")
        net["out_conv"] = _convk(sd, "out.3")
    elif pool == "attention":
        net["GroupNorm32_0"] = _groupnorm("out.0")
        net["attn_pool"] = {
            # torch stores (C, S+1); ours is (S+1, C)
            "positional_embedding": _np(sd["out.2.positional_embedding"]).T,
            "qkv_proj": _convk(sd, "out.2.qkv_proj"),
            "c_proj": _convk(sd, "out.2.c_proj"),
        }
    else:  # spatial: Linear,ReLU,Linear → out.{0,2}; _v2: Linear,GN,SiLU,Linear → out.{0,1,3}
        net["out_0"] = _dense(sd, "out.0")
        if pool == "spatial_v2":
            net["GroupNorm32_0"] = _groupnorm("out.1")
            net["out_3"] = _dense(sd, "out.3")
        else:
            net["out_3"] = _dense(sd, "out.2")
    return {"params": net}


def convert_reference_checkpoints(ae_pt: str = "", model_pt: str = "", out_dir: str = "."):
    """CLI helper: load reference .pt files and write npz param trees."""
    import os

    import torch

    from .checkpoint import save_params_npz

    os.makedirs(out_dir, exist_ok=True)
    if ae_pt:
        ck = torch.load(ae_pt, map_location="cpu")
        if "encoder" in ck:
            save_params_npz(
                os.path.join(out_dir, "ae_encoder.npz"), convert_dgcnn(ck["encoder"])
            )
        if "decoder" in ck:
            save_params_npz(
                os.path.join(out_dir, "ae_decoder.npz"), convert_cbn_decoder(ck["decoder"])
            )
    if model_pt:
        sd = torch.load(model_pt, map_location="cpu")
        save_params_npz(
            os.path.join(out_dir, "mdm_unet.npz"), convert_mdm_unet(sd)
        )


# ---------------------------------------------------------------------------
# Export direction: surfd_tpu trees → reference .pt state-dict layouts
# (MIGRATION.md's switching guide both ways; the import converters above are
# the spec — each exporter is their mechanical inverse, and the round-trip
# ours → state_dict → convert_* is bitwise on every array).
# ---------------------------------------------------------------------------


def _a(x):
    return np.asarray(x, np.float32)


def _exp_dense(out, prefix, p):
    out[f"{prefix}.weight"] = _a(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _a(p["bias"])


def _exp_conv1x1(out, prefix, p):
    out[f"{prefix}.weight"] = _a(p["kernel"]).T[:, :, None]
    if "bias" in p:
        out[f"{prefix}.bias"] = _a(p["bias"])


def _exp_convk(out, prefix, p):
    out[f"{prefix}.weight"] = _a(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        out[f"{prefix}.bias"] = _a(p["bias"])


def _exp_bn(out, prefix, params, stats):
    if params:
        out[f"{prefix}.weight"] = _a(params["scale"])
        out[f"{prefix}.bias"] = _a(params["bias"])
    out[f"{prefix}.running_mean"] = _a(stats["mean"])
    out[f"{prefix}.running_var"] = _a(stats["var"])
    # torch BatchNorm1d tracks this buffer; strict load_state_dict wants it
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _exp_groupnorm(out, prefix, p):
    out[f"{prefix}.weight"] = _a(p["GroupNorm_0"]["scale"])
    out[f"{prefix}.bias"] = _a(p["GroupNorm_0"]["bias"])


def export_dgcnn(variables: Dict) -> Dict[str, np.ndarray]:
    """models.Dgcnn variables → reference Dgcnn state_dict (numpy values).

    Inverse of convert_dgcnn (reference layout:
    /root/reference/AutoEncoder/models/dgcnn.py:27-115)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}
    for i in range(1, 5):
        sd[f"conv_{i}.weight"] = _a(params[f"block{i}_conv"]["kernel"]).T
        _exp_bn(sd, f"bn_{i}", params[f"block{i}_bn"], stats[f"block{i}_bn"])
    sd["conv_5.weight"] = _a(params["head_conv"]["kernel"]).T
    _exp_bn(sd, "bn_5", params["head_bn"], stats["head_bn"])
    return sd


def export_cbn_decoder(variables: Dict, num_hidden_layers: int | None = None) -> Dict[str, np.ndarray]:
    """models.CbnDecoder variables → reference state_dict (cbndec.py:106-134
    layout, `decoder.*` prefix). Inverse of convert_cbn_decoder.
    num_hidden_layers defaults to the block count present in the tree."""
    params, stats = variables["params"], variables["batch_stats"]
    if num_hidden_layers is None:
        num_hidden_layers = sum(1 for k in params if k.startswith("block_"))
    sd: Dict[str, np.ndarray] = {}

    def cbn(prefix, p, s):
        _exp_conv1x1(sd, f"{prefix}.conv_gamma", p["gamma"])
        _exp_conv1x1(sd, f"{prefix}.conv_beta", p["beta"])
        _exp_bn(sd, f"{prefix}.bn", {}, s["bn"])

    _exp_conv1x1(sd, "decoder.fc_p", params["fc_p"])
    _exp_conv1x1(sd, "decoder.fc_out", params["fc_out"])
    for i in range(num_hidden_layers):
        b = f"decoder.blocks.{i}"
        p, s = params[f"block_{i}"], stats[f"block_{i}"]
        cbn(f"{b}.bn_0", p["bn_0"], s["bn_0"])
        cbn(f"{b}.bn_1", p["bn_1"], s["bn_1"])
        _exp_conv1x1(sd, f"{b}.fc_0", p["fc_0"])
        _exp_conv1x1(sd, f"{b}.fc_1", p["fc_1"])
    cbn("decoder.bn", params["bn_out"], stats["bn_out"])
    return sd


def export_mdm_unet(variables: Dict, model_channels: int = 224,
                    channel_mult=(1, 2, 4, 4), num_res_blocks: int = 2,
                    prefix: str = "Unet.") -> Dict[str, np.ndarray]:
    """models.MDM params → reference MDM state_dict (`Unet.*` keys, the
    layout training_loop_single.py:320-355 saves after stripping CLIP).
    Inverse of convert_mdm_unet; the CFG null-class embedding row (ours only)
    is dropped on the way out."""
    unet = variables["params"]["unet"]
    sd: Dict[str, np.ndarray] = {}

    def res(prefix_, p):
        _exp_groupnorm(sd, f"{prefix_}.in_layers.0", p["GroupNorm32_0"])
        _exp_convk(sd, f"{prefix_}.in_layers.2", p["in_conv"])
        _exp_dense(sd, f"{prefix_}.emb_layers.1", p["emb_proj"])
        _exp_groupnorm(sd, f"{prefix_}.out_layers.0", p["GroupNorm32_1"])
        _exp_convk(sd, f"{prefix_}.out_layers.3", p["out_conv"])
        if "skip" in p:
            _exp_convk(sd, f"{prefix_}.skip_connection", p["skip"])

    def attn(prefix_, p):
        _exp_groupnorm(sd, f"{prefix_}.norm", p["GroupNorm32_0"])
        _exp_convk(sd, f"{prefix_}.qkv", p["qkv"])
        _exp_convk(sd, f"{prefix_}.proj_out", p["proj_out"])

    _exp_dense(sd, "time_embed.0", unet["time_embed_0"])
    _exp_dense(sd, "time_embed.2", unet["time_embed_2"])
    _exp_convk(sd, "input_blocks.0.0", unet["in_conv"])
    _exp_groupnorm(sd, "out.0", unet["GroupNorm32_0"])
    _exp_convk(sd, "out.2", unet["out_conv"])
    if "label_emb" in unet:
        # drop our reserved null-class row (convert_mdm_unet pads it back)
        sd["label_emb.weight"] = _a(unet["label_emb"]["embedding"])[:-1]
    if "context_proj" in unet:
        _exp_dense(sd, "sketch_emb", unet["context_proj"])

    idx, ds = 1, 1
    attn_res = (4, 2, 1)
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            res(f"input_blocks.{idx}.0", unet[f"down_{level}_{i}"])
            if ds in attn_res:
                attn(f"input_blocks.{idx}.1", unet[f"down_attn_{level}_{i}"])
            idx += 1
        if level != len(channel_mult) - 1:
            _exp_convk(sd, f"input_blocks.{idx}.0.op", unet[f"downsample_{level}"]["op"])
            idx += 1
            ds *= 2

    res("middle_block.0", unet["mid_res_0"])
    attn("middle_block.1", unet["mid_attn"])
    res("middle_block.2", unet["mid_res_1"])

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            res(f"output_blocks.{idx}.0", unet[f"up_{level}_{i}"])
            pos = 1
            if ds in attn_res:
                attn(f"output_blocks.{idx}.{pos}", unet[f"up_attn_{level}_{i}"])
                pos += 1
            if level and i == num_res_blocks:
                _exp_convk(sd, f"output_blocks.{idx}.{pos}.conv", unet[f"upsample_{level}"]["conv"])
                ds //= 2
            idx += 1

    return {prefix + k: v for k, v in sd.items()} if prefix else sd


def export_reference_checkpoints(ae_vars=None, mdm_vars=None, out_dir: str = ".",
                                 **mdm_kw):
    """Write reference-layout .pt files from our trees (reverse of
    convert_reference_checkpoints): ae.pt with {'encoder','decoder'} state
    dicts, model.pt with `Unet.*` keys."""
    import os

    import torch

    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    def to_torch(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    if ae_vars is not None:
        enc_vars, dec_vars = ae_vars
        ck = {}
        if enc_vars is not None:
            ck["encoder"] = to_torch(export_dgcnn(enc_vars))
        if dec_vars is not None:
            ck["decoder"] = to_torch(export_cbn_decoder(dec_vars))
        paths["ae"] = os.path.join(out_dir, "ae.pt")
        torch.save(ck, paths["ae"])
    if mdm_vars is not None:
        paths["model"] = os.path.join(out_dir, "model.pt")
        torch.save(to_torch(export_mdm_unet(mdm_vars, **mdm_kw)), paths["model"])
    return paths
