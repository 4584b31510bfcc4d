"""TF float golden: rebuild the shipped checkpoint's graph with standard ops.

Test-only helper. Replays the functional graph stored in a .keras archive's
config.json using vanilla tf.keras layers plus a hand-rolled hybrid frontend
(transpose -> channel-pad -> 1x1 mel mixer -> relu -> max-norm -> pwl DW
branches -> transpose), with all weights taken from model.weights.h5. Used to
produce exact float reference activations for transplant parity tests.
"""

from __future__ import annotations

import numpy as np

from birdnet_stm32_tpu.models.transplant import layer_h5_names, read_keras_archive


def build_tf_golden(keras_path: str):
    """Return a callable(x) -> dict of {layer_name: np.ndarray activations}."""
    import tensorflow as tf

    graph, h5 = read_keras_archive(keras_path)
    layers = graph["config"]["layers"]
    name_map = layer_h5_names(layers)

    def vars_of(name):
        g = h5["layers"][name_map[name]]["vars"]
        return [np.asarray(g[str(i)]) for i in range(len(g.keys()))]

    fe_cfg = next(l.get("config", {}) for l in layers
                  if l["class_name"] == "AudioFrontendLayer")
    spec_width = int(fe_cfg.get("spec_width", 256))

    def frontend_apply(x):
        g = h5["layers"][name_map["audio_frontend"]]
        mixer = np.asarray(g["mel_mixer"]["vars"]["0"])  # [1,1,264,64]
        k0 = np.asarray(g["_pwl_k0_dw"]["vars"]["0"]).reshape(-1)
        ks, ws, bs = [], [], []
        for sub in ["depthwise_conv2d", "depthwise_conv2d_1", "depthwise_conv2d_2"]:
            ks.append(np.asarray(g["_pwl_k_dws"][sub]["vars"]["0"]).reshape(-1))
            ws.append(np.asarray(g["_pwl_shift_dws"][sub]["vars"]["0"]).reshape(-1))
            bs.append(np.asarray(g["_pwl_shift_dws"][sub]["vars"]["1"]).reshape(-1))

        y = tf.transpose(x, [0, 3, 2, 1])  # [B,1,W,257]
        # Reference frontend.py:303-304 slices the time axis to spec_width
        # BEFORE the mixer; skipping it would change the max-normalization
        # denominator for wider inputs.
        y = y[:, :, :spec_width, :]
        pad = mixer.shape[2] - y.shape[-1]
        if pad:
            y = tf.concat([y, tf.zeros([tf.shape(y)[0], 1, y.shape[2], pad])], axis=-1)
        y = tf.nn.conv2d(y, mixer, strides=1, padding="SAME")
        y = tf.nn.relu(y)
        y = y / (tf.reduce_max(y, axis=[1, 2, 3], keepdims=True) + 1e-6)
        out = k0 * y
        for ki, wi, bi in zip(ks, ws, bs):
            out = out + ki * tf.nn.relu(wi * y + bi)
        return tf.transpose(out, [0, 3, 2, 1])  # [B,64,W,1]

    def run(x: np.ndarray) -> dict[str, np.ndarray]:
        acts: dict[str, np.ndarray] = {}
        tensors: dict[str, tf.Tensor] = {}

        def inbound(layer):
            out = []
            for node in layer.get("inbound_nodes", []):
                def rec(a):
                    if isinstance(a, dict) and "keras_history" in a.get("config", {}):
                        out.append(a["config"]["keras_history"][0])
                    elif isinstance(a, (list, tuple)):
                        for e in a:
                            rec(e)
                rec(node.get("args", []))
            return out

        for layer in layers:
            cls, name = layer["class_name"], layer["name"]
            cfg = layer.get("config", {})
            ins = [tensors[n] for n in inbound(layer)]
            if cls == "InputLayer":
                tensors[name] = tf.constant(x)
                continue
            if cls == "AudioFrontendLayer":
                t = frontend_apply(ins[0])
            elif cls == "Conv2D":
                v = vars_of(name)
                if cfg.get("activation") not in (None, "linear"):
                    raise ValueError(f"{name}: fused Conv2D activation "
                                     f"{cfg['activation']!r} not replayed")
                if tuple(cfg.get("dilation_rate", (1, 1))) != (1, 1):
                    raise ValueError(f"{name}: dilation not replayed")
                t = tf.nn.conv2d(ins[0], v[0], strides=[1, *cfg["strides"], 1], padding=cfg["padding"].upper())
                if len(v) > 1:
                    t = tf.nn.bias_add(t, v[1])
            elif cls == "DepthwiseConv2D":
                v = vars_of(name)
                if len(v) > 1:
                    # The reference builder sets use_bias=False; silently
                    # dropping a bias would corrupt the golden activations.
                    raise ValueError(f"{name}: DepthwiseConv2D bias not replayed")
                t = tf.nn.depthwise_conv2d(ins[0], v[0], strides=[1, *cfg["strides"], 1], padding=cfg["padding"].upper())
            elif cls == "BatchNormalization":
                gamma, beta, mean, var = vars_of(name)
                t = tf.nn.batch_normalization(ins[0], mean, var, beta, gamma, cfg.get("epsilon", 1e-3))
            elif cls == "ReLU":
                mv = cfg.get("max_value")
                t = tf.nn.relu(ins[0])
                if mv is not None:
                    t = tf.minimum(t, mv)
            elif cls in ("SpatialDropout2D", "Dropout"):
                t = ins[0]
            elif cls == "Add":
                t = tf.add_n(ins)
            elif cls == "GlobalAveragePooling2D":
                t = tf.reduce_mean(ins[0], axis=[1, 2], keepdims=cfg.get("keepdims", False))
            elif cls == "Dense":
                v = vars_of(name)
                t = tf.matmul(ins[0], v[0])
                if len(v) > 1:
                    t = tf.nn.bias_add(t, v[1])
                act = cfg.get("activation")
                if act == "sigmoid":
                    t = tf.sigmoid(t)
                elif act == "softmax":
                    t = tf.nn.softmax(t)
                elif act not in (None, "linear"):
                    raise ValueError(act)
            else:
                raise ValueError(f"Unhandled layer class {cls}")
            tensors[name] = t
            acts[name] = t.numpy()
        return acts

    return run
