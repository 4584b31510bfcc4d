"""Keras-checkpoint -> Flax transplant for DS-CNN models.

Loads a reference `.keras` archive (Keras 3 zip: config.json +
model.weights.h5) WITHOUT TensorFlow and maps its weights into this
framework's DSCNN parameter tree.

Two naming worlds must be bridged:
- `config.json` holds the functional graph with the builder's layer names
  (stem_conv, stage1_ds1_dw, ..., reference models/dscnn.py:87-262).
- `model.weights.h5` groups layers by snake_case(class name) with a
  per-class counter in `model.layers` order (Keras 3 saving_lib behavior),
  e.g. the second BatchNormalization anywhere in the model is
  `layers/batch_normalization_1` regardless of its graph name.

We therefore walk config.json's layer list in order, regenerate each
layer's h5 group name from its class counter, and copy weights into the
flax params by graph name (our module names == reference graph names).
"""

from __future__ import annotations

import io
import json
import re
import zipfile
from pathlib import Path
from typing import Any

import h5py
import numpy as np

from birdnet_stm32_tpu.config import ModelConfig


def _snake_case(name: str) -> str:
    """Keras' class-name -> default-name conversion (Conv2D -> conv2d)."""
    s = re.sub(r"(.)([A-Z][a-z0-9]+)", r"\1_\2", name)
    s = re.sub(r"([a-z])([A-Z])", r"\1_\2", s)
    return s.lower().replace("__", "_")


def read_keras_archive(path: str | Path) -> tuple[dict, "h5py.File"]:
    """Return (functional graph config, open weights h5) from a .keras zip."""
    z = zipfile.ZipFile(path)
    graph = json.loads(z.read("config.json"))
    h5 = h5py.File(io.BytesIO(z.read("model.weights.h5")), "r")
    return graph, h5


def layer_h5_names(layers: list[dict]) -> dict[str, str]:
    """Map graph layer name -> h5 group name under `layers/`."""
    counters: dict[str, int] = {}
    mapping: dict[str, str] = {}
    for layer in layers:
        slug = _snake_case(layer["class_name"])
        n = counters.get(slug, 0)
        counters[slug] = n + 1
        mapping[layer["name"]] = slug if n == 0 else f"{slug}_{n}"
    return mapping


def detect_arch(layers: list[dict]) -> dict[str, Any]:
    """Infer architecture toggles from graph layer names/classes.

    The sidecar config JSON may predate fields like use_se (the shipped
    checkpoint's sidecar lacks them while its graph is plain-DS), so the
    graph is the source of truth.
    """
    import re

    names = [l["name"] for l in layers]
    # Match the builder's exact block-name patterns (dscnn.py stage naming),
    # not bare substrings: a user-chosen layer name that merely CONTAINS
    # '_se' or '_ir1' (e.g. 'probe_sep') must not toggle whole block types.
    has = lambda pat: any(re.search(pat, n) for n in names)  # noqa: E731
    out: dict[str, Any] = {
        # reference dscnn.py:214-246 block names: stage{i}_ir{b}_<sublayer>,
        # stage{i}_se{b}_<squeeze|reduce|expand|scale> (plain-DS + SE), and
        # stage{i}_ir{b}_se_<...> (IR + SE, blocks.py:113).
        "use_inverted_residual": has(r"^stage\d+_ir\d+_"),
        "use_se": has(r"^stage\d+_(ir\d+_)?se\d*_(squeeze|reduce|expand|scale)$"),
        "use_attention_pooling": any(l["class_name"] == "AttentionPooling" for l in layers),
    }
    for l in layers:
        if l["class_name"] == "Dense" and l["name"] == "pred":
            out["class_activation"] = l["config"].get("activation", "softmax")
    return out


def _vars(h5, group: str) -> list[np.ndarray]:
    g = h5["layers"][group]["vars"]
    return [np.asarray(g[str(i)]) for i in range(len(g.keys()))]


def _frontend_params(h5, group: str, mag_scale: str, fft_bins: int) -> dict:
    """Map the custom AudioFrontendLayer's weights (attribute-path keyed)."""
    g = h5["layers"][group]
    out: dict[str, Any] = {}
    mag: dict[str, Any] = {}

    def get(path: str):
        node = g
        for part in path.split("/"):
            if part not in node:
                return None
            node = node[part]
        return node

    # Hybrid mel mixer: [1, 1, cin_padded, M] -> [fft_bins, M] (strip the
    # zero-input channel padding, frontend.py:269-276).
    # The reference constructs mel_mixer unconditionally but only BUILDS it
    # in hybrid mode; unbuilt sublayers still serialize an EMPTY vars group
    # (Keras 3 saving_lib), so also require the weight entry itself.
    mixer = get("mel_mixer/vars")
    if mixer is not None and "0" in mixer:
        k = np.asarray(mixer["0"])
        out["mel_mixer"] = k[0, 0, :fft_bins, :]

    # Raw filterbank: Conv2D [1, k_t, 1, M] -> 1-D conv [k_t, 1, M].
    for cand in ("fb2d/vars", "audio_frontend_raw_fb2d/vars"):
        fb = get(cand)
        if fb is not None:
            out["raw_fb"] = {"kernel": np.asarray(fb["0"])[0]}
            break
    fb_bn = get("fb_bn/vars")
    if fb_bn is not None:
        v = [np.asarray(fb_bn[str(i)]) for i in range(4)]
        out["raw_fb_bn"] = {"scale": v[0], "bias": v[1]}
        out["_raw_fb_bn_stats"] = {"mean": v[2], "var": v[3]}

    def dw_vec(path: str):
        node = get(path)
        if node is None:
            return None
        return np.asarray(node["0"]).reshape(-1)

    def dw_bias(path: str):
        node = get(path)
        if node is None or "1" not in node:
            return None
        return np.asarray(node["1"]).reshape(-1)

    def require(key: str, value, what: str):
        """Sibling sublayers must all be present once the prefix resolved:
        a None here would otherwise surface as an opaque jnp.asarray(None)
        TypeError long after the cause."""
        if value is None:
            raise KeyError(
                f"checkpoint frontend is missing the '{what}' weights "
                f"expected for mag_scale={mag_scale!r} (found its siblings "
                "under the same prefix — renamed or partially-saved layer?)")
        mag[key] = value

    if mag_scale == "pwl":
        # Older checkpoints keep pwl weights on the frontend itself
        # (_pwl_*); newer ones nest them under the mag layer.
        for prefix in ("", "mag_layer/"):
            k0 = dw_vec(f"{prefix}_pwl_k0_dw/vars")
            if k0 is None:
                continue
            mag["pwl_k0"] = k0
            for i, sub in enumerate(["depthwise_conv2d", "depthwise_conv2d_1", "depthwise_conv2d_2"], start=1):
                require(f"pwl_k{i}", dw_vec(f"{prefix}_pwl_k_dws/{sub}/vars"),
                        f"_pwl_k_dws/{sub}")
                require(f"pwl_shift{i}_w", dw_vec(f"{prefix}_pwl_shift_dws/{sub}/vars"),
                        f"_pwl_shift_dws/{sub} kernel")
                require(f"pwl_shift{i}_b", dw_bias(f"{prefix}_pwl_shift_dws/{sub}/vars"),
                        f"_pwl_shift_dws/{sub} bias")
            break
    elif mag_scale == "pcen":
        for prefix in ("", "mag_layer/"):
            agc = dw_vec(f"{prefix}_pcen_agc_dw/vars")
            if agc is None:
                continue
            mag["pcen_agc"] = agc
            require("pcen_k1", dw_vec(f"{prefix}_pcen_k1_dw/vars"), "_pcen_k1_dw")
            require("pcen_shift_w", dw_vec(f"{prefix}_pcen_shift_dw/vars"),
                    "_pcen_shift_dw kernel")
            require("pcen_shift_b", dw_bias(f"{prefix}_pcen_shift_dw/vars"),
                    "_pcen_shift_dw bias")
            require("pcen_k2mk1", dw_vec(f"{prefix}_pcen_k2mk1_dw/vars"), "_pcen_k2mk1_dw")
            break

    if mag:
        out["mag"] = mag
    return out


def transplant_params(keras_path: str | Path, cfg: ModelConfig) -> tuple[dict, dict[str, Any]]:
    """Build flax variables {params, batch_stats} from a .keras checkpoint.

    Args:
        keras_path: Path to the Keras 3 archive.
        cfg: Sidecar ModelConfig (audio/frontend fields; architecture
            toggles are re-detected from the graph).

    Returns:
        (variables dict, detected-architecture overrides dict).
    """
    graph, h5 = read_keras_archive(keras_path)
    layers = graph["config"]["layers"]
    name_map = layer_h5_names(layers)
    arch = detect_arch(layers)

    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    for layer in layers:
        cls, name = layer["class_name"], layer["name"]
        group = name_map[name]
        if cls == "Conv2D":
            v = _vars(h5, group)
            entry = {"kernel": v[0]}
            if len(v) > 1:
                entry["bias"] = v[1]
            params[name] = entry
        elif cls == "DepthwiseConv2D":
            (k,) = _vars(h5, group)
            if k.shape[3] != 1:
                # The (0,1,3,2) transpose below is only valid for
                # depth_multiplier=1; flax grouped convs want group-major
                # [kh,kw,1,C*m] which this mapping does not produce.
                raise NotImplementedError(
                    f"DepthwiseConv2D '{name}' has depth_multiplier="
                    f"{k.shape[3]}; transplant supports multiplier 1 only "
                    "(the reference builder never emits more)")
            params[name] = {"kernel": np.transpose(k, (0, 1, 3, 2))}  # [kh,kw,C,1]->[kh,kw,1,C]
        elif cls == "BatchNormalization":
            gamma, beta, mean, var = _vars(h5, group)
            params[name] = {"scale": gamma, "bias": beta}
            stats[name] = {"mean": mean, "var": var}
        elif cls == "Dense":
            v = _vars(h5, group)
            entry = {"kernel": v[0]}
            if len(v) > 1:
                entry["bias"] = v[1]
            params[name] = entry
        elif cls == "AudioFrontendLayer":
            fe = _frontend_params(h5, group, cfg.mag_scale, cfg.fft_bins)
            bn_stats = fe.pop("_raw_fb_bn_stats", None)
            params["audio_frontend"] = fe
            if bn_stats is not None:
                stats["audio_frontend"] = {"raw_fb_bn": bn_stats}
        elif cls == "AttentionPooling":
            g = h5["layers"][group]
            # Keras 3 keys nested layers by ATTRIBUTE name: the reference
            # stores Dense(1, name="score") in self._score_dense
            # (blocks.py:148), so the h5 group is "_score_dense".
            for key in ("_score_dense", "score"):
                if key in g and "vars" in g[key] and "0" in g[key]["vars"]:
                    # Dense(1, use_bias=False): kernel only (blocks.py:148).
                    params["attn_pool_score"] = {
                        "kernel": np.asarray(g[key]["vars"]["0"])}
                    break

    import jax.numpy as jnp

    to_jnp = lambda tree: {  # noqa: E731
        k: (to_jnp(v) if isinstance(v, dict) else jnp.asarray(v, jnp.float32)) for k, v in tree.items()
    }
    variables = {"params": to_jnp(params)}
    if stats:
        variables["batch_stats"] = to_jnp(stats)
    return variables, arch


def load_reference_model(keras_path: str | Path, config_path: str | Path):
    """One-call loader: .keras + sidecar JSON -> (model, variables, cfg).

    The returned model uses `class_activation` as stored in the graph.
    """
    import dataclasses

    from birdnet_stm32_tpu.models.dscnn import build_dscnn

    cfg = ModelConfig.load(config_path)
    variables, arch = transplant_params(keras_path, cfg)
    activation = arch.pop("class_activation", "softmax")
    cfg = dataclasses.replace(cfg, **{k: v for k, v in arch.items()})
    model = build_dscnn(cfg, class_activation=activation)
    return model, variables, cfg
