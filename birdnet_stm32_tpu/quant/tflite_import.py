"""TFLite flatbuffer -> JAX integer-graph executor.

The reference deploys by converting Keras to INT8 TFLite and validating with
the TFLite interpreter (conversion/quantize.py:111-163). The TPU equivalent
runs the *same integer graph* on the MXU: this module parses a .tflite
flatbuffer (per-tensor activation scales, per-channel weight scales, op
options) and builds a jittable batched JAX function that reproduces the
interpreter's arithmetic:

- int8 convolutions accumulate exactly in int32 (MXU int8 x int8 -> int32),
  with SAME padding realized by padding with the input zero point and the
  zero-point correction folded into a per-channel constant;
- requantization uses the real multiplier in_s * w_s / out_s with
  round-half-away-from-zero (TFLite's fixed-point pipeline differs by at
  most 1 LSB in rare ties);
- LOGISTIC is a 256-entry lookup table, elementwise-exact.

Shape-manipulation subgraphs (SHAPE/PACK/FILL feeding dynamic zero padding)
are partially evaluated on the host at build time for a static batch size.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from tensorflow.lite.python import schema_py_generated as fb

_OPNAMES = {v: k for k, v in fb.BuiltinOperator.__dict__.items() if not k.startswith("_")}

# FusedActivationFunction enum.
_ACT_NONE, _ACT_RELU, _ACT_RELU_N1_1, _ACT_RELU6 = 0, 1, 2, 3


@dataclass
class TensorInfo:
    index: int
    shape: tuple
    dtype: str
    scale: np.ndarray | None  # [1] per-tensor or [C] per-channel
    zero_point: np.ndarray | None
    quantized_dimension: int
    data: np.ndarray | None  # constant buffer contents, else None


@dataclass
class OpInfo:
    name: str
    inputs: list[int]
    outputs: list[int]
    options: dict[str, Any] = field(default_factory=dict)


_DTYPES = {
    fb.TensorType.FLOAT32: ("float32", np.float32),
    fb.TensorType.INT8: ("int8", np.int8),
    fb.TensorType.INT16: ("int16", np.int16),
    fb.TensorType.INT32: ("int32", np.int32),
    fb.TensorType.INT64: ("int64", np.int64),
    fb.TensorType.BOOL: ("bool", np.bool_),
    fb.TensorType.UINT8: ("uint8", np.uint8),
}


def _options(op, name):
    """Decode the builtin options union for the op kinds we support."""
    tbl = op.BuiltinOptions()
    if tbl is None:
        return {}

    def init(cls):
        o = cls()
        o.Init(tbl.Bytes, tbl.Pos)
        return o

    if name == "CONV_2D":
        o = init(fb.Conv2DOptions)
        return {
            "strides": (o.StrideH(), o.StrideW()),
            "padding": "SAME" if o.Padding() == fb.Padding.SAME else "VALID",
            "dilation": (o.DilationHFactor(), o.DilationWFactor()),
            "activation": o.FusedActivationFunction(),
        }
    if name == "DEPTHWISE_CONV_2D":
        o = init(fb.DepthwiseConv2DOptions)
        return {
            "strides": (o.StrideH(), o.StrideW()),
            "padding": "SAME" if o.Padding() == fb.Padding.SAME else "VALID",
            "dilation": (o.DilationHFactor(), o.DilationWFactor()),
            "activation": o.FusedActivationFunction(),
            "depth_multiplier": o.DepthMultiplier(),
        }
    if name == "ADD":
        o = init(fb.AddOptions)
        return {"activation": o.FusedActivationFunction()}
    if name == "FULLY_CONNECTED":
        o = init(fb.FullyConnectedOptions)
        return {"activation": o.FusedActivationFunction(),
                "weights_format": o.WeightsFormat(),
                "keep_num_dims": bool(o.KeepNumDims())}
    if name == "SOFTMAX":
        o = init(fb.SoftmaxOptions)
        return {"beta": float(o.Beta())}
    if name == "CONCATENATION":
        o = init(fb.ConcatenationOptions)
        return {"axis": o.Axis(), "activation": o.FusedActivationFunction()}
    if name in ("MEAN", "REDUCE_MAX", "SUM"):
        o = init(fb.ReducerOptions)
        return {"keepdims": bool(o.KeepDims())}
    if name == "SUB":
        o = init(fb.SubOptions)
        return {"activation": o.FusedActivationFunction()}
    if name == "MUL":
        o = init(fb.MulOptions)
        return {"activation": o.FusedActivationFunction()}
    if name == "DIV":
        o = init(fb.DivOptions)
        return {"activation": o.FusedActivationFunction()}
    if name == "RESHAPE":
        o = init(fb.ReshapeOptions)
        return {"new_shape": [int(d) for d in o.NewShapeAsNumpy()]
                if o.NewShapeLength() else []}
    if name == "STRIDED_SLICE":
        o = init(fb.StridedSliceOptions)
        return {
            "begin_mask": o.BeginMask(),
            "end_mask": o.EndMask(),
            "ellipsis_mask": o.EllipsisMask(),
            "new_axis_mask": o.NewAxisMask(),
            "shrink_axis_mask": o.ShrinkAxisMask(),
        }
    if name == "PACK":
        o = init(fb.PackOptions)
        return {"axis": o.Axis(), "count": o.ValuesCount()}
    return {}


class TFLiteGraph:
    """Parsed .tflite model: tensor metadata + ops in execution order."""

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, bytes):
            buf = path_or_bytes
        else:
            with open(path_or_bytes, "rb") as f:
                buf = f.read()
        model = fb.Model.GetRootAsModel(buf, 0)
        sg = model.Subgraphs(0)
        opcodes = [model.OperatorCodes(i) for i in range(model.OperatorCodesLength())]

        self.tensors: list[TensorInfo] = []
        for i in range(sg.TensorsLength()):
            t = sg.Tensors(i)
            dtype_name, np_dtype = _DTYPES[t.Type()]
            q = t.Quantization()
            scale = zp = None
            qdim = 0
            if q is not None and q.ScaleLength() > 0:
                scale = q.ScaleAsNumpy().astype(np.float64)
                zp_raw = q.ZeroPointAsNumpy()
                # flatbuffers returns int 0 for an absent vector field.
                zp = (np.zeros_like(scale, np.int64) if isinstance(zp_raw, int)
                      else zp_raw.astype(np.int64))
                qdim = q.QuantizedDimension()
            sh_raw = t.ShapeAsNumpy()
            shape = () if isinstance(sh_raw, int) else tuple(int(s) for s in sh_raw)
            data = None
            b = model.Buffers(t.Buffer())
            if b.DataLength() > 0:
                raw = b.DataAsNumpy()
                data = np.frombuffer(raw.tobytes(), dtype=np_dtype).reshape(shape)
            self.tensors.append(
                TensorInfo(i, shape, dtype_name, scale, zp, qdim, data)
            )

        self.ops: list[OpInfo] = []
        for i in range(sg.OperatorsLength()):
            op = sg.Operators(i)
            oc = opcodes[op.OpcodeIndex()]
            # Pre-TF-2.3 writers populate only the deprecated int8 opcode
            # field; TFLite resolves with max(builtin, deprecated).
            code = max(int(oc.BuiltinCode()),
                       int(getattr(oc, "DeprecatedBuiltinCode", lambda: 0)()))
            name = _OPNAMES[code]
            self.ops.append(
                OpInfo(
                    name,
                    [int(x) for x in op.InputsAsNumpy()],
                    [int(x) for x in op.OutputsAsNumpy()],
                    _options(op, name),
                )
            )
        self.inputs = [int(x) for x in sg.InputsAsNumpy()]
        self.outputs = [int(x) for x in sg.OutputsAsNumpy()]

        # This executor implements int8 arithmetic ([-128,127] clamps, int8
        # casts) throughout. uint8 (pre-TF-2.3 writers) and int16-activation
        # graphs would parse but compute garbage — reject them loudly.
        used = {i for op in self.ops for i in (*op.inputs, *op.outputs) if i >= 0}
        bad = sorted({self.tensors[i].dtype for i in used
                      if self.tensors[i].dtype in ("uint8", "int16")})
        if bad:
            raise NotImplementedError(
                f"graph uses {bad} tensors: this executor implements the "
                "int8 quantization scheme only (uint8/int16 graphs would be "
                "silently corrupted, not approximated)")


def _round_away(x):
    """Round half away from zero (TFLite quantize rounding)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


# --- Bit-exact gemmlowp fixed-point pipeline -------------------------------
#
# TFLite requantizes with MultiplyByQuantizedMultiplier: a saturating rounding
# doubling-high multiply (SRDHM) by an int32 fixed-point multiplier, then a
# rounding divide by a power of two. Reproducing its exact tie behavior needs
# the high 33 bits of an int32*int32 product, which we synthesize from 16-bit
# limbs in uint32 arithmetic (no int64 on TPU).


def _quantize_multiplier(m: float) -> tuple[int, int]:
    """double multiplier -> (int32 fixed-point multiplier, shift)."""
    if m == 0.0:
        return 0, 0
    import math

    q, shift = math.frexp(m)
    # TFLite uses TfLiteRound (half AWAY from zero); Python round() is
    # half-to-even and quantizes exact .5 mantissa ties 1 off. q > 0 here
    # (quant scales are positive), so floor(x + 0.5) is half-away.
    q_fixed = int(math.floor(q * (1 << 31) + 0.5))
    if q_fixed == (1 << 31):
        q_fixed //= 2
        shift += 1
    if shift < -31:
        return 0, 0
    return q_fixed, shift


def _srdhm(x, qm: int):
    """SaturatingRoundingDoublingHighMul(x, qm) for qm > 0, elementwise.

    Computes trunc((x*qm + nudge) / 2^31) with nudge = 2^30 (x>=0) or
    1 - 2^30 (x<0), exactly, via 16-bit limb decomposition.
    """
    neg = x < 0
    a = jnp.abs(x).astype(jnp.uint32)
    b_hi, b_lo = np.uint32(qm >> 16), np.uint32(qm & 0xFFFF)
    a_hi = a >> 16
    a_lo = a & 0xFFFF
    hh = a_hi * b_hi                      # < 2^30
    mid = a_hi * b_lo + a_lo * b_hi       # < 2^32
    ll = a_lo * b_lo                      # < 2^32
    low = ll + ((mid & 0xFFFF) << 16)     # wraps mod 2^32
    carry = (low < ll).astype(jnp.uint32)
    high = hh + (mid >> 16) + carry       # p = high*2^32 + low
    # (p + addend) >> 31, addend = 2^30 (pos) or 2^30 - 1 (neg, then negate):
    addend = jnp.where(neg, jnp.uint32((1 << 30) - 1), jnp.uint32(1 << 30))
    low2 = low + addend
    carry2 = (low2 < low).astype(jnp.uint32)
    high2 = high + carry2
    r = ((high2 << 1) | (low2 >> 31)).astype(jnp.int32)
    return jnp.where(neg, -r, r)


def _rdbp(x, exponent: int):
    """Rounding divide by power of two: (x + 2^(e-1)) >> e, ties toward +inf.

    Determined empirically against the TF 2.21 interpreter (its requant
    pipeline is SRDHM followed by add-half-then-arithmetic-shift, not the
    threshold-based gemmlowp RoundingDivideByPOT).
    """
    if exponent == 0:
        return x
    return (x + jnp.int32(1 << (exponent - 1))) >> exponent


def _mbqm_limbs(x, qm_np: np.ndarray, shift_np: np.ndarray):
    """Fused MultiplyByQuantizedMultiplier via signed 16-bit limbs.

    Bit-exact rewrite of ``_rdbp(_srdhm(x << left, qm), right)`` in one
    pass, using two identities (both fuzz-verified against the int64
    golden, including tie cases — tests/test_quant.py):

    1. gemmlowp's sign-dependent nudge + truncating divide collapses to a
       uniform addend under floor (arithmetic shift) semantics:
         SRDHM(x, qm) = (x*qm + 2^30) >>arith 31   for qm > 0, both signs.
    2. nested floors compose: the trailing rounding-divide-by-POT is
         (srdhm + 2^(right-1)) >>arith right,
       so the whole requant is ((x*qm + K) >>arith 31) >>arith right with
       K = 2^30 + 2^(30+right) folded into the 64-bit product once.

    The 33 high bits of the signed int32*int32 product come from signed
    16-bit limb decomposition in int32/uint32 (TPUs have no int64):
    x = x_hi*2^16 + x_lo with x_hi = x >>arith 16 (so x_hi*qm terms carry
    the sign) — no abs/negate/select pass, one carry chain.

    qm_np/shift_np are numpy scalars or per-channel vectors broadcast
    along the last axis. Precondition (holds for every accumulator a
    TFLite graph can produce, since requant output clamps to int8):
    |x << left| < 2^31 - 2^right.
    """
    qm_np = np.atleast_1d(np.asarray(qm_np, np.int64))
    shift_np = np.atleast_1d(np.asarray(shift_np, np.int64))
    left = np.maximum(shift_np, 0).astype(np.int32)
    right = np.maximum(-shift_np, 0).astype(np.int64)
    if left.any():  # static skip: conv multipliers are almost always < 1
        x = jnp.left_shift(x, jnp.asarray(left))
    b_hi = jnp.asarray((qm_np >> 16).astype(np.int32))   # < 2^15
    b_lo = jnp.asarray((qm_np & 0xFFFF).astype(np.int32))
    K = (1 << 30) + np.where(right > 0, np.int64(1) << (30 + right), 0)
    k_lo = jnp.asarray((K & 0xFFFFFFFF).astype(np.uint32))
    k_hi = jnp.asarray((K >> 32).astype(np.int32))
    x_hi = x >> 16                       # arithmetic: carries the sign
    x_lo = x & 0xFFFF                    # [0, 2^16)
    hh = x_hi * b_hi                     # |.| < 2^30, exact in int32
    m1 = x_hi * b_lo                     # |.| < 2^31, exact in int32
    m2 = x_lo * b_hi                     # < 2^31
    ll = x_lo.astype(jnp.uint32) * b_lo.astype(jnp.uint32)
    # p + K = high*2^32 + low, accumulated with carry detection per add
    # (for uint32 a + b, carry out iff result < a).
    low0 = ll + (m1.astype(jnp.uint32) << 16)
    c1 = (low0 < ll).astype(jnp.int32)
    low1 = low0 + (m2.astype(jnp.uint32) << 16)
    c2 = (low1 < low0).astype(jnp.int32)
    low2 = low1 + k_lo
    c3 = (low2 < low1).astype(jnp.int32)
    high = hh + (m1 >> 16) + (m2 >> 16) + k_hi + c1 + c2 + c3
    r31 = (high << 1) | (low2 >> 31).astype(jnp.int32)   # (p+K) >>arith 31
    return jnp.right_shift(r31, jnp.asarray(right.astype(np.int32)))


def _mbqm(x, qm: int, shift: int):
    """MultiplyByQuantizedMultiplier: exact TFLite requant of int32 x."""
    return _mbqm_limbs(x, qm, shift)


def _mbqm_host(x: np.ndarray, qm: int, shift: int) -> np.ndarray:
    """Exact MBQM evaluated on the host with Python-int semantics.

    For constant operands (e.g. an ADD's per-channel threshold vector): the
    folded-K floor form of _mbqm_limbs computed directly in int64
    (|x << left| < 2^31 by the same precondition, so x*qm < 2^62).
    """
    x = np.asarray(x, np.int64)
    left, right = max(shift, 0), max(-shift, 0)
    K = (1 << 30) + ((1 << (30 + right)) if right > 0 else 0)
    return ((x << left) * qm + K) >> (31 + right)


def _mbqm_host_vec(x: np.ndarray, qm: np.ndarray, shift: np.ndarray):
    """_mbqm_host with per-element qm/shift (broadcasting), int64 host math."""
    x = np.asarray(x, np.int64)
    qm = np.asarray(qm, np.int64)
    shift = np.asarray(shift, np.int64)
    left = np.maximum(shift, 0)
    right = np.maximum(-shift, 0)
    K = (np.int64(1) << 30) + np.where(right > 0, np.int64(1) << (30 + right), 0)
    return ((x << left) * qm + K) >> (31 + right)


def _mbqm_small(x, qm_np: np.ndarray, shift_np: np.ndarray):
    """Exact MBQM for |x| <= 2^15 — 2 multiplies, ~7 VPU ops.

    The folded floor form is floor((x*qm + K) / 2^(31+right)) with
    K = 2^30 + (2^(30+right) if right else 0) (see _mbqm_limbs). For small
    x the full product fits 47 bits, so a single 16-bit split of qm
    (qm = b_hi*2^16 + b_lo) and the nested-floor identity
    floor(P/2^(31+right)) = floor(floor(P/2^16) / 2^(15+right)) give

        floor(P/2^16)  = x*b_hi + ((x*b_lo) >>arith 16) + (K >> 16)
        result         = that >>arith (15 + right)

    (2^30 is a multiple of 2^16, so its floor term is exact; x*b_lo fits
    int32 for |x| <= 2^15.) The trailing rounding-divide addend
    2^(30+right) is applied AFTER the >>31 as 2^(right-1) — a multiple of
    2^31 divides out exactly for right >= 1 — so no term ever depends on
    right and any 0 <= right <= 31 is admissible. Preconditions checked
    by _mbqm_bounded: |x| <= 2^15, no left shift.
    """
    qm_np = np.atleast_1d(np.asarray(qm_np, np.int64))
    right = np.maximum(-np.atleast_1d(np.asarray(shift_np, np.int64)), 0)
    b_hi = jnp.asarray((qm_np >> 16).astype(np.int32))
    b_lo = jnp.asarray((qm_np & 0xFFFF).astype(np.int32))
    rk = jnp.asarray(np.where(right > 0, np.int64(1) << (right - 1), 0)
                     .astype(np.int32))
    s31 = (x * b_hi + ((x * b_lo) >> 16) + (1 << 14)) >> 15
    return jnp.right_shift(s31 + rk, jnp.asarray(right.astype(np.int32)))


def _mbqm_mid(x, qm_np: np.ndarray, shift_np: np.ndarray):
    """Exact MBQM for |x| <= 2^29 — 4 multiplies, no carry chain (~15 ops).

    Balanced-signed limb split of x (x_hi = (x + 2^15) >>arith 16,
    x_lo = x - x_hi*2^16 in [-2^15, 2^15)) keeps every partial product in
    int32, and the nested-floor identities eliminate _mbqm_limbs's
    uint32 carry-detect chain entirely:

        P0 = x*qm + 2^30 = hh*2^32 + (m1 + m2)*2^16 + ll + 2^30
        floor(P0/2^16) = hh*2^16 + mid,
            mid = m1 + m2 + ((ll >>arith 16) + 2^14)
        s31 = floor(P0/2^31) = (hh << 1) + (mid >>arith 15)
        result = (s31 + 2^(right-1) if right else s31) >>arith right

    (the trailing rounding-divide addend 2^(30+right) is a multiple of
    2^31 for right >= 1, so it moves outside the >>31 as 2^(right-1) —
    no term depends on right and any 0 <= right <= 31 is admissible).

    Bound audit for |x| <= 2^29: |x_hi| <= 2^13 so |hh| <= 2^28,
    |m1| < 2^29, |m2| < 2^30, |ll| <= 2^31 - 2^15 (int32),
    |mid| < 2^29 + 2^30 + 2^15 + 2^14 < 2^31, |s31| <= ~2^29 so
    s31 + 2^(right-1) < 2^31. Preconditions checked by _mbqm_bounded:
    |x| <= 2^29, no left shift.
    """
    qm_np = np.atleast_1d(np.asarray(qm_np, np.int64))
    right = np.maximum(-np.atleast_1d(np.asarray(shift_np, np.int64)), 0)
    b_hi = jnp.asarray((qm_np >> 16).astype(np.int32))
    b_lo = jnp.asarray((qm_np & 0xFFFF).astype(np.int32))
    rk = jnp.asarray(np.where(right > 0, np.int64(1) << (right - 1), 0)
                     .astype(np.int32))
    x_hi = (x + (1 << 15)) >> 16
    x_lo = x - (x_hi << 16)
    hh = x_hi * b_hi
    mid = x_hi * b_lo + x_lo * b_hi + (((x_lo * b_lo) >> 16) + (1 << 14))
    s31 = (hh << 1) + (mid >> 15)
    return jnp.right_shift(s31 + rk, jnp.asarray(right.astype(np.int32)))


def _mbqm_bounded(x, qm_np, shift_np, bound: int | None):
    """Exact MBQM, picking the cheapest form the accumulator bound admits.

    bound is a host-computed guarantee that |x| <= bound for every value
    this op can ever produce (full int8 input code range, exact weights/
    bias); None means unknown. Every form is bit-exact — the bound only
    selects between implementations, it never changes results.
    """
    if bound is not None and bool(np.all(np.atleast_1d(np.asarray(shift_np)) <= 0)):
        if bound <= (1 << 15):
            return _mbqm_small(x, qm_np, shift_np)
        if bound <= (1 << 29):
            return _mbqm_mid(x, qm_np, shift_np)
    return _mbqm_limbs(x, qm_np, shift_np)


def _mbqm_shifted_small(x, qm: int, shift: int, pre_shift: int = 20):
    """Exact MBQM(x << pre_shift, qm, shift) for small |x| — 2 multiplies.

    TFLite's int8 ADD/SUB rescales each input as
    MBQM((code - zp) << 20, qm, shift) with |code - zp| <= 255. The full
    product then has ~51 significant bits, but the pre-shift cancels
    against the fixed >>31: with D = 31 + right - pre_shift and
    K' = (2^30 + 2^(30+right)) >> pre_shift the op is exactly
    floor((x*qm + K') / 2^D). Splitting qm = q_hi*2^D + q_lo and using
    floor((A*2^D + C) / 2^D / 2^0 ...) == A + floor(C / 2^D) for integer A
    (nested-floor identity, fuzz-tested against _mbqm in tests/test_quant.py):

        result = x*q_hi + (x*q_lo + K') >> D

    Both terms fit int32 for |x| <= 255 when 8 <= D <= 22:
    |x*q_hi| < 255*2^(31-D) <= 2^31 and |x*q_lo + K'| < 255*2^D + 2^(D-1)*3
    < 2^31. ~5 VPU ops instead of the ~25-op generic limb pass — the
    ADD-heavy integer graphs spend most of their elementwise time here.

    Caller must guarantee shift <= 0, pre_shift <= 30, and 8 <= D <= 22
    (_add_rescale checks and falls back to the limb pass otherwise).
    """
    right = -shift
    D = 31 + right - pre_shift
    K = (1 << 30) + ((1 << (30 + right)) if right > 0 else 0)
    Kp = K >> pre_shift  # exact: K is a multiple of 2^30, pre_shift <= 30
    q_hi = np.int32(qm >> D)
    q_lo = np.int32(qm & ((1 << D) - 1))
    return x * q_hi + ((x * q_lo + np.int32(Kp)) >> D)


def _add_rescale(x, qm: int, shift: int, pre_shift: int = 20):
    """Rescale one ADD/SUB input: exact MBQM(x << pre_shift, qm, shift),
    via the 2-multiply small-operand form when its preconditions hold."""
    D = 31 - shift - pre_shift
    if shift <= 0 and pre_shift <= 30 and 8 <= D <= 22:
        return _mbqm_shifted_small(x, qm, shift, pre_shift)
    return _mbqm(x << pre_shift, qm, shift)


def _mbqm_ref(x, qm: int, shift: int):
    """Two-stage reference formulation (gemmlowp SRDHM then RDBP); kept as
    the documented golden for tests/test_quant.py's equivalence check."""
    left = max(shift, 0)
    right = max(-shift, 0)
    if left:
        x = x << left
    return _rdbp(_srdhm(x, qm), right)


def _requant_exact(acc, multipliers: np.ndarray, zp: int, lo: int, hi: int,
                   acc_range=None):
    """Per-channel exact requantization of an int32 accumulator [..., C].

    acc_range, when given, is a host-proved exact per-channel reachable
    accumulator range (lo_c, hi_c) from _conv_acc_range. Two bit-exact
    rewrites follow from MBQM's monotonicity in x:

    1. A channel whose host goldens at both endpoints requantize to the
       same output code is CONSTANT for every reachable input — its
       device compute is dead and it is overwritten with that code. (The
       reference model's converter clamps dead-channel biases to exactly
       +/-2^30 with near-zero multipliers — quantize.cc bias saturation —
       which is what produces such channels in practice.)
    2. The cheap-form bound (see _mbqm_bounded) only needs to cover the
       LIVE channels, so saturated-bias channels no longer force the op
       onto the generic limb pass.
    """
    qms = [_quantize_multiplier(float(m)) for m in np.atleast_1d(multipliers)]
    qm_np = np.array([q for q, _ in qms], np.int64)
    sh_np = np.array([s for _, s in qms], np.int64)

    const_vals = None
    acc_bound = None
    if acc_range is not None:
        lo_c, hi_c = acc_range
        if bool(np.all(sh_np <= 0)):
            g_lo = np.clip(_mbqm_host_vec(lo_c, qm_np, sh_np) + zp, lo, hi)
            g_hi = np.clip(_mbqm_host_vec(hi_c, qm_np, sh_np) + zp, lo, hi)
            const_mask = g_lo == g_hi
            live = ~const_mask
            acc_bound = int(np.max(np.abs(np.concatenate(
                [lo_c[live], hi_c[live]])))) if live.any() else 0
            if const_mask.any():
                const_vals = np.where(const_mask, g_lo, 0).astype(np.int8)
                const_mask_j = jnp.asarray(const_mask)
        else:
            acc_bound = int(max(np.max(np.abs(lo_c)), np.max(np.abs(hi_c))))

    q = _mbqm_bounded(acc, qm_np, sh_np, acc_bound)
    out = jnp.clip(q + zp, lo, hi).astype(jnp.int8)
    if const_vals is not None:
        out = jnp.where(const_mask_j, jnp.asarray(const_vals), out)
    return out


def _conv_acc_range(w: np.ndarray, axes: tuple, in_zp: int,
                    correction: np.ndarray | int):
    """Exact per-channel accumulator range for conv/FC-style ops.

    acc[..., c] = sum_taps w_t * (x_t - in_zp) + correction_c with input
    codes x in [-128, 127] (padding contributes exactly 0 after the
    in_zp fold). Each tap independently picks the endpoint matching its
    weight sign, so the endpoint sums are exact *reachable* per-channel
    extremes, computed in int64 on the host. Returns (lo_c, hi_c) int64
    vectors of length C.
    """
    a_min, a_max = -128 - in_zp, 127 - in_zp
    pos = np.maximum(w, 0).astype(np.int64).sum(axis=axes)
    neg = np.minimum(w, 0).astype(np.int64).sum(axis=axes)
    corr = np.asarray(correction, np.int64)
    hi_c = pos * a_max + neg * a_min + corr
    lo_c = pos * a_min + neg * a_max + corr
    return (np.atleast_1d(lo_c), np.atleast_1d(hi_c))


def _act_bounds(activation: int, scale: float, zp: int):
    """Fused-activation clamp bounds in the quantized domain."""
    lo, hi = -128, 127
    if activation == _ACT_RELU:
        lo = max(lo, int(zp))
    elif activation == _ACT_RELU6:
        lo = max(lo, int(zp))
        hi = min(hi, int(round(6.0 / scale) + zp))
    elif activation == _ACT_RELU_N1_1:
        lo = max(lo, int(round(-1.0 / scale) + zp))
        hi = min(hi, int(round(1.0 / scale) + zp))
    return lo, hi


def _tf_same_pads(in_size: int, k: int, stride: int, dilation: int = 1):
    eff_k = (k - 1) * dilation + 1
    out = -(-in_size // stride)
    total = max(0, (out - 1) * stride + eff_k - in_size)
    return total // 2, total - total // 2


def _requant_fast(acc, multipliers: np.ndarray, zp: int, lo: int, hi: int,
                  acc_range=None):
    """Float-multiply requantization: round_away(acc * m) + zp.

    Deviates from TFLite's fixed-point pipeline by at most 1 LSB per op
    (SRDHM tie cases + float32 mantissa rounding of large accumulators);
    ~3x fewer VPU ops than the exact path. The per-op LSB flips CASCADE
    through a deep integer graph: measured end-to-end on the flagship
    100-class checkpoint, final scores deviate on ~7% of elements and
    cosine vs the bit-exact executor is mean 0.996 / min 0.987 — BELOW
    the framework's >=0.999 conversion gate. Opt-in only
    (build_executor(..., requant="fast") / TFLiteSimRunner
    requant="fast")) for throughput work that tolerates ~1-LSB output
    noise; anything quality-gated must use the default bit-exact
    pipeline (which is also the bench.py headline).
    """
    m = jnp.asarray(np.atleast_1d(multipliers).astype(np.float32))
    q = _round_away(acc.astype(jnp.float32) * m).astype(jnp.int32) + zp
    return jnp.clip(q, lo, hi).astype(jnp.int8)


def entry_transpose_perm(graph: TFLiteGraph) -> tuple | None:
    """Perm of the graph's leading QUANTIZE -> TRANSPOSE pattern, else None.

    Converted frontends carry input [B, F, W, 1] -> quantize -> transpose to
    [B, 1, W, F]. Since quantize is elementwise, a caller whose features are
    naturally produced in the transposed orientation can feed them directly
    (build_executor(pretransposed_input=True)), skipping two full-tensor
    transposes (the producer's swapaxes and the graph's) bit-exactly.
    """
    if len(graph.ops) < 2:
        return None
    q, t = graph.ops[0], graph.ops[1]
    # The TRANSPOSE must be the quantize output's ONLY consumer: skipping
    # ops {0, 1} must not starve another op of the quantized tensor.
    n_cons = sum(q.outputs[0] in op.inputs for op in graph.ops)
    if (q.name == "QUANTIZE" and q.inputs[0] == graph.inputs[0]
            and t.name == "TRANSPOSE" and t.inputs[0] == q.outputs[0]
            and n_cons == 1 and q.outputs[0] not in graph.outputs
            and graph.tensors[t.inputs[1]].data is not None):
        return tuple(int(p) for p in graph.tensors[t.inputs[1]].data)
    return None


def entry_quant_params(graph: TFLiteGraph) -> tuple[float, int]:
    """(scale, zero_point) of the graph's entry QUANTIZE output — what a
    producer fusing the entry quantization (prequantized_input) must
    quantize the float features with."""
    if entry_transpose_perm(graph) is None:
        raise ValueError("graph does not start with QUANTIZE -> TRANSPOSE")
    t = graph.tensors[graph.ops[0].outputs[0]]
    return float(t.scale[0]), int(t.zero_point[0])


def build_executor(graph: TFLiteGraph, batch_size: int, return_all: bool = False,
                   requant: str = "exact",
                   pretransposed_input: bool = False,
                   prequantized_input: bool = False) -> Callable[[jax.Array], jax.Array]:
    """Build a jittable fn mapping the float input batch to float outputs.

    Args:
        graph: Parsed model. The single subgraph input must be float32 (the
            reference converter enforces float I/O, quantize.py:131-163).
        batch_size: Static batch size the executor is traced for.
        requant: 'exact' (bit-exact TFLite fixed-point requant) or 'fast'
            (float-multiply requant, <=1 LSB per op but the flips cascade:
            end-to-end cosine ~0.996 on the flagship graph — see
            _requant_fast; fails the 0.999 gate, opt-in only).
        pretransposed_input: Feed the float input already in the entry
            TRANSPOSE's output orientation (entry_transpose_perm); the
            quantize runs on it directly and the transpose is skipped.
        prequantized_input: The input is ALREADY the int8 entry tensor in
            the entry TRANSPOSE's output orientation — a producer fused the
            entry quantize (e.g. the Pallas frontend kernel's int8-quantize
            epilogue, ops/pallas/frontend_kernel.py). Implies the
            pretransposed layout; entry_quant_params(graph) gives the
            (scale, zero_point) the producer must quantize with.

    Returns:
        f(x: [B, ...] float32) -> [B, ...] float32, jax.jit-compatible
        (x is int8 with prequantized_input).
    """
    T = graph.tensors
    _requant_op = _requant_exact if requant == "exact" else _requant_fast

    _entry_skip: set[int] = set()
    _entry_target = None
    if pretransposed_input or prequantized_input:
        if entry_transpose_perm(graph) is None:
            raise ValueError("graph does not start with QUANTIZE -> TRANSPOSE")
        _entry_skip = {0, 1}
        _entry_target = graph.ops[1].outputs[0]

    # --- Transpose elision pre-pass --------------------------------------
    # TFLite graphs converted from NHWC-with-frontend Keras models carry
    # TRANSPOSE -> (identity STRIDED_SLICE) -> CONV chains. Materializing
    # the transpose of a [B, H, W, 1] int8 tensor costs ~10% of the whole
    # model on TPU (terrible lane utilization); instead the conv consumes
    # the untransposed tensor with adjusted dimension numbers (bit-exact:
    # only the physical layout changes).
    _consumers: dict[int, list[int]] = {}
    for _i, _op in enumerate(graph.ops):
        for _t in _op.inputs:
            _consumers.setdefault(_t, []).append(_i)

    # --- Constant-channel-pad (CONCAT of FILL) fold -----------------------
    # Keras hybrid frontends pad the mel-mixer input channels to a multiple
    # of 8 by concatenating a constant FILL (reference frontend.py:269-276).
    # A consuming 1x1 conv can absorb the pad channels into its bias: each
    # pad channel contributes w * (pad_code - zp), a constant per output
    # channel — so the CONCAT (a full-tensor HBM copy) is elided, the conv
    # reads the unpadded tensor with sliced weights, and the constant rides
    # the existing bias correction. Bit-exact: the removed integer terms
    # are added back exactly.
    _concat_fold: dict[int, tuple[int, int]] = {}  # out tensor -> (n_lead, code)
    _folded_concat_ops: set[int] = set()
    for _i, _op in enumerate(graph.ops):
        if _op.name != "CONCATENATION" or len(_op.inputs) != 2:
            continue
        t_dyn, t_pad = _op.inputs
        out = _op.outputs[0]
        info_out = graph.tensors[out]
        if (info_out.dtype != "int8" or len(info_out.shape) != 4
                or _op.options["axis"] not in (3, -1)
                or _op.options.get("activation", _ACT_NONE) != _ACT_NONE):
            continue
        sd, zd = graph.tensors[t_dyn].scale, graph.tensors[t_dyn].zero_point
        so_, zo_ = info_out.scale, info_out.zero_point
        if float(sd[0]) != float(so_[0]) or int(zd[0]) != int(zo_[0]):
            continue  # pass-through part would need requantization
        # The pad operand must be a uniform constant: a const tensor, or a
        # FILL of a const scalar.
        pad_code = None
        tp = graph.tensors[t_pad]
        if tp.data is not None and np.all(np.asarray(tp.data) == np.asarray(tp.data).flat[0]):
            pad_code = int(np.asarray(tp.data).flat[0])
        else:
            prod = [j for j, p in enumerate(graph.ops) if t_pad in p.outputs]
            if len(prod) == 1 and graph.ops[prod[0]].name == "FILL":
                vt = graph.ops[prod[0]].inputs[1]
                if graph.tensors[vt].data is not None:
                    pad_code = int(np.asarray(graph.tensors[vt].data).reshape(()))
        if pad_code is None:
            continue
        sp, zp_ = tp.scale, tp.zero_point
        if float(sp[0]) != float(so_[0]) or int(zp_[0]) != int(zo_[0]):
            # Requantize the constant exactly as ConcatenationWithScaling
            # would (same float32 association as the CONCATENATION branch).
            inv_so = np.float32(1.0) / np.float32(so_[0])
            scale = np.float32(sp[0]) * inv_so
            bias_f = np.float32(-int(zp_[0])) * scale
            f = np.float32(pad_code) * scale + bias_f
            pad_code = int(np.clip(np.sign(f) * np.floor(np.abs(f) + np.float32(0.5))
                                   + int(zo_[0]), -128, 127))
        cons_all = _consumers.get(out, [])
        if any(graph.ops[c].name == "SHAPE" for c in cons_all):
            continue  # SHAPE would observe the unpadded physical shape
        cons = [c for c in cons_all if graph.ops[c].name != "SHAPE"]
        if out in graph.outputs or len(cons) != 1:
            continue
        nxt = graph.ops[cons[0]]
        wt = graph.tensors[nxt.inputs[1]] if len(nxt.inputs) > 1 else None
        if (nxt.name != "CONV_2D" or nxt.inputs[0] != out or wt is None
                or wt.data is None or wt.shape[1] != 1 or wt.shape[2] != 1):
            continue  # only 1x1 convs: no boundary-padding interaction
        _concat_fold[out] = (int(graph.tensors[t_dyn].shape[-1]), pad_code)
        _folded_concat_ops.add(_i)

    def _slice_is_identity(op) -> bool:
        t_in, t_out = graph.tensors[op.inputs[0]], graph.tensors[op.outputs[0]]
        if t_in.shape != t_out.shape or op.options.get("shrink_axis_mask"):
            return False
        if any(graph.tensors[op.inputs[k]].data is None for k in (1, 2, 3)):
            return False  # dynamic slice params: can't prove identity, no elision
        if op.options.get("ellipsis_mask") or op.options.get("new_axis_mask"):
            return False  # dims don't map 1:1 to param entries; decline
        begin = np.asarray(graph.tensors[op.inputs[1]].data)
        strides = np.asarray(graph.tensors[op.inputs[3]].data)
        end = np.asarray(graph.tensors[op.inputs[2]].data)
        if min(len(begin), len(end), len(strides)) < len(t_in.shape):
            return False
        bm, em = op.options["begin_mask"], op.options["end_mask"]
        for d, dim in enumerate(t_in.shape):
            b = 0 if (bm >> d) & 1 else int(begin[d])
            e = dim if (em >> d) & 1 else int(end[d])
            if b != 0 or e != dim or int(strides[d]) != 1:
                return False
        return True

    # op index -> "alias" (forward input unchanged); tensor -> pending perm.
    _alias_ops: set[int] = set()
    _pending_perm: dict[int, tuple] = {}
    _chains: list[list[int]] = []
    for _i, _op in enumerate(graph.ops):
        if _op.name != "TRANSPOSE" or graph.tensors[_op.inputs[1]].data is None:
            continue
        perm = tuple(int(p) for p in graph.tensors[_op.inputs[1]].data)
        if len(perm) != 4 or perm[0] != 0:
            continue
        chain = [_i]
        t = _op.outputs[0]
        ok = False
        while True:
            # SHAPE consumers don't block elision: the SHAPE branch reports
            # the LOGICAL shape for perm-pending tensors. A graph output
            # still counts: an elided tensor would be returned in the wrong
            # (untransposed) layout.
            cons = [c for c in _consumers.get(t, [])
                    if graph.ops[c].name != "SHAPE"]
            if len(cons) != 1 or t in graph.outputs:
                break
            nxt = graph.ops[cons[0]]
            if nxt.name == "STRIDED_SLICE" and _slice_is_identity(nxt) and nxt.inputs[0] == t:
                chain.append(cons[0])
                t = nxt.outputs[0]
                continue
            if cons[0] in _folded_concat_ops and nxt.inputs[0] == t:
                # A folded constant-pad CONCAT forwards its first input;
                # the consuming conv handles both the perm and the pad.
                chain.append(cons[0])
                t = nxt.outputs[0]
                continue
            ok = nxt.name in ("CONV_2D", "DEPTHWISE_CONV_2D") and nxt.inputs[0] == t
            break
        if ok:
            _alias_ops.update(chain)
            _chains.append(chain)
            for ci in chain:
                _pending_perm[graph.ops[ci].outputs[0]] = perm

    # Folded constant-pad CONCATs alias their first input even outside a
    # transpose chain (e.g. under pretransposed/prequantized entry).
    _alias_ops.update(_folded_concat_ops)

    if _entry_target is not None:
        # The entry transpose is handled by the pretransposed-input path,
        # never by the elision pre-pass: its input arrives ALREADY
        # transposed, so pending-perm dimension remapping on the consuming
        # conv would double-apply. Clear the perms for the WHOLE chain
        # rooted at the entry transpose (identity slices in between stay
        # aliases — forwarding the already-transposed tensor is correct,
        # only the conv's dimension remap must not fire).
        _alias_ops.discard(1)
        for ch in _chains:
            if ch and ch[0] == 1:
                for ci in ch:
                    _pending_perm.pop(graph.ops[ci].outputs[0], None)
        _pending_perm.pop(_entry_target, None)

    def tshape(idx):
        s = list(T[idx].shape)
        if s and s[0] == 1:
            s[0] = batch_size
        return tuple(s)

    def executor(x):
        vals: dict[int, jax.Array] = {}
        host: dict[int, np.ndarray] = {}  # partially-evaluated shape values

        def get(idx):
            if idx in vals:
                return vals[idx]
            info = T[idx]
            if info.data is None:
                raise KeyError(f"tensor {idx} ({info.dtype}) has no value")
            vals[idx] = jnp.asarray(info.data)
            return vals[idx]

        def get_host(idx):
            if idx in host:
                return host[idx]
            info = T[idx]
            assert info.data is not None, f"host value for tensor {idx} unavailable"
            return np.asarray(info.data)

        def q_params(idx):
            info = T[idx]
            return info.scale, info.zero_point, info.quantized_dimension

        if prequantized_input:
            # The producer already quantized (and oriented) the entry
            # tensor; consume it verbatim.
            vals[_entry_target] = x
        elif _entry_target is not None:
            # x arrives in the transpose-output orientation; quantize is
            # elementwise, so quantizing here == transpose(quantize(x')).
            s0, z0, _ = q_params(graph.ops[0].outputs[0])
            q = _round_away(x / float(s0[0])) + int(z0[0])
            vals[_entry_target] = jnp.clip(q, -128, 127).astype(jnp.int8)
        else:
            vals[graph.inputs[0]] = x

        for op_index, op in enumerate(graph.ops):
            name, ins, outs = op.name, op.inputs, op.outputs
            o = outs[0]

            if op_index in _entry_skip:
                continue

            if op_index in _alias_ops:
                # Elided TRANSPOSE / identity slice: forward the untransposed
                # value; the consuming conv adjusts its dimension numbers.
                vals[o] = get(ins[0])
                continue

            if name == "QUANTIZE":
                src = get(ins[0])
                s, z, _ = q_params(o)
                if src.dtype == jnp.float32:
                    q = _round_away(src / float(s[0])) + int(z[0])
                elif requant == "exact":
                    # int8 -> int8 requantize: TFLite's Requantize kernel is
                    # MultiplyByQuantizedMultiplier(x - zi, qm, shift) + zo
                    # (reference quantize.h), not a float multiply.
                    si, zi, _ = q_params(ins[0])
                    qm, sh = _quantize_multiplier(float(si[0]) / float(s[0]))
                    q = _mbqm_bounded(src.astype(jnp.int32) - int(zi[0]),
                                      qm, sh, 255) + int(z[0])
                else:
                    si, zi, _ = q_params(ins[0])
                    q = _round_away((src.astype(jnp.float32) - int(zi[0])) * (float(si[0]) / float(s[0]))) + int(z[0])
                vals[o] = jnp.clip(q, -128, 127).astype(jnp.int8)

            elif name == "DEQUANTIZE":
                s, z, _ = q_params(ins[0])
                vals[o] = (get(ins[0]).astype(jnp.float32) - int(z[0])) * float(s[0])

            elif name == "TRANSPOSE":
                perm = tuple(int(p) for p in get_host(ins[1]))
                vals[o] = jnp.transpose(get(ins[0]), perm)

            elif name == "SHAPE":
                if ins[0] in _pending_perm and ins[0] in vals:
                    # Elided-transpose alias: vals holds the PHYSICAL
                    # (untransposed) array; report the logical shape.
                    p = _pending_perm[ins[0]]
                    phys = vals[ins[0]].shape
                    host[o] = np.asarray([phys[p[k]] for k in range(len(p))], np.int32)
                else:
                    host[o] = np.asarray(vals[ins[0]].shape if ins[0] in vals else tshape(ins[0]), np.int32)

            elif name == "PACK":
                parts = [get_host(i) for i in ins]
                host[o] = np.stack([np.asarray(p).reshape(()) for p in parts]).astype(np.int32)

            elif name == "FILL":
                dims = tuple(int(d) for d in get_host(ins[0]))
                value = get_host(ins[1]).reshape(())
                vals[o] = jnp.full(dims, value, dtype=jnp.int8 if T[o].dtype == "int8" else None)

            elif name == "STRIDED_SLICE":
                src_is_host = ins[0] in host
                begin = [int(v) for v in get_host(ins[1])]
                end = [int(v) for v in get_host(ins[2])]
                strides = [int(v) for v in get_host(ins[3])]
                if op.options.get("new_axis_mask") or op.options.get("ellipsis_mask"):
                    raise NotImplementedError(
                        "STRIDED_SLICE with new_axis/ellipsis masks is not supported")
                bm, em, sm = op.options["begin_mask"], op.options["end_mask"], op.options["shrink_axis_mask"]
                slices = []
                for d in range(len(begin)):
                    b = None if (bm >> d) & 1 else begin[d]
                    e = None if (em >> d) & 1 else end[d]
                    if (d == 0 and not src_is_host and b in (None, 0)
                            and e == 1 and T[ins[0]].shape
                            and T[ins[0]].shape[0] == 1):
                        # Literal batch-1 end from a batch-1 export: the
                        # slice meant "the whole batch" — remap to the
                        # executor's real batch (same rule SHAPE/RESHAPE
                        # apply) instead of truncating to one sample.
                        e = None
                    if (sm >> d) & 1:
                        slices.append(begin[d])
                    else:
                        slices.append(slice(b, e, strides[d]))
                slices = tuple(slices)
                if src_is_host:
                    host[o] = host[ins[0]][slices]
                else:
                    vals[o] = get(ins[0])[slices]

            elif name == "CONCATENATION":
                axis = op.options["axis"]
                so, zo, _ = q_params(o)
                parts = []
                for i in ins:
                    p = get(i)
                    si, zi, _ = q_params(i)
                    if float(si[0]) != float(so[0]) or int(zi[0]) != int(zo[0]):
                        # TFLite ConcatenationWithScaling: float32 path with
                        # a precomputed inverse output scale — mirror its
                        # exact association: round(x*scale + bias) + zo.
                        inv_so = np.float32(1.0) / np.float32(so[0])
                        scale = np.float32(si[0]) * inv_so
                        bias = np.float32(-int(zi[0])) * scale
                        f = p.astype(jnp.float32) * scale + bias
                        p = jnp.clip(_round_away(f) + int(zo[0]), -128, 127).astype(jnp.int8)
                    parts.append(p)
                cat = jnp.concatenate(parts, axis=axis)
                act = op.options.get("activation", _ACT_NONE)
                if act != _ACT_NONE:
                    lo, hi = _act_bounds(act, float(so[0]), int(zo[0]))
                    cat = jnp.clip(cat, lo, hi)
                vals[o] = cat

            elif name in ("CONV_2D", "DEPTHWISE_CONV_2D"):
                xin = get(ins[0])
                w = get_host(ins[1])  # CONV: [O,kh,kw,I]; DW: [1,kh,kw,C]
                bias = get_host(ins[2]).astype(np.int64) if len(ins) > 2 and ins[2] >= 0 else 0
                si, zi, _ = q_params(ins[0])
                sw, _, _ = q_params(ins[1])
                so, zo, _ = q_params(o)
                in_zp = int(zi[0])
                sh, swd = op.options["strides"]
                dil = op.options.get("dilation", (1, 1))

                # Physical axis of each logical NHWC axis (transpose elision).
                perm = _pending_perm.get(ins[0], (0, 1, 2, 3))

                if (name == "DEPTHWISE_CONV_2D" and w.shape[1] == w.shape[2] == 1
                        and (sh, swd) == (1, 1) and tuple(dil) == (1, 1)
                        and w.shape[0] == 1 and perm == (0, 1, 2, 3)
                        and w.shape[3] == xin.shape[3]):  # depth_multiplier == 1
                    # 1x1 stride-1 depthwise conv == per-channel affine:
                    # acc[..., c] = w_c * (x - zp) + bias_c. The PWL/PCEN
                    # frontend encodings are chains of these (reference
                    # magnitude.py:99-192); a grouped 1x1 lax.conv wastes
                    # the MXU, one VPU multiply doesn't. Same int32 math,
                    # bit-exact.
                    wv = w.reshape(-1).astype(np.int64)  # [C]
                    sw, _, _ = q_params(ins[1])
                    so, zo, _ = q_params(o)
                    bias_vec = np.broadcast_to(bias, wv.shape).astype(np.int64)
                    acc = (xin.astype(jnp.int32) - int(zi[0])) * jnp.asarray(wv, jnp.int32)
                    acc = acc + jnp.asarray(bias_vec, jnp.int32)
                    mult = si[0] * sw.astype(np.float64) / so[0]
                    lo, hi = _act_bounds(op.options["activation"], float(so[0]), int(zo[0]))
                    vals[o] = _requant_op(acc, mult, int(zo[0]), lo, hi,
                                          acc_range=_conv_acc_range(
                                              wv, (), int(zi[0]), bias_vec))
                    continue

                # Folded constant-pad CONCAT: consume the unpadded tensor
                # with the leading weight channels; the pad channels'
                # constant contribution joins the bias correction below.
                _fold = _concat_fold.get(ins[0]) if name == "CONV_2D" else None
                pad_corr = 0
                if _fold is not None:
                    n_lead, pad_code = _fold
                    pad_corr = (w[:, :, :, n_lead:].astype(np.int64)
                                .sum(axis=(1, 2, 3)) * (pad_code - in_zp))
                    w = w[:, :, :, :n_lead]

                if name == "CONV_2D":
                    rhs = jnp.asarray(np.transpose(w, (1, 2, 3, 0)))  # HWIO
                    groups = 1
                    w_sum = w.astype(np.int64).sum(axis=(1, 2, 3))  # [O]
                else:
                    rhs = jnp.asarray(np.transpose(w, (1, 2, 0, 3)))  # [kh,kw,1,C]
                    groups = xin.shape[perm[3]]
                    w_sum = w.astype(np.int64).sum(axis=(0, 1, 2))  # [C]

                kh, kw = rhs.shape[0], rhs.shape[1]
                if op.options["padding"] == "SAME":
                    ph = _tf_same_pads(xin.shape[perm[1]], kh, sh, dil[0])
                    pw = _tf_same_pads(xin.shape[perm[2]], kw, swd, dil[1])
                    padcfg = [(0, 0)] * 4
                    padcfg[perm[1]], padcfg[perm[2]] = ph, pw
                    xin = jnp.pad(xin, padcfg, constant_values=np.int8(in_zp))

                dn = lax.ConvDimensionNumbers(
                    lhs_spec=(perm[0], perm[3], perm[1], perm[2]),
                    rhs_spec=(3, 2, 0, 1),   # HWIO
                    out_spec=(0, 3, 1, 2),   # NHWC
                )
                acc = lax.conv_general_dilated(
                    xin, rhs,
                    window_strides=(sh, swd),
                    padding="VALID",
                    rhs_dilation=dil,
                    dimension_numbers=dn,
                    feature_group_count=groups,
                    preferred_element_type=jnp.int32,
                )
                correction = (bias - in_zp * w_sum + pad_corr).astype(np.int64)
                acc = acc + jnp.asarray(correction, jnp.int32)
                mult = si[0] * sw.astype(np.float64) / so[0]  # [O] or [1]
                lo, hi = _act_bounds(op.options["activation"], float(so[0]), int(zo[0]))
                # bias + pad_corr (NOT the -in_zp*w_sum part, which is the
                # zero-point fold already modeled by the (x - zp) form).
                tap_axes = (1, 2, 3) if name == "CONV_2D" else (0, 1, 2)
                vals[o] = _requant_op(acc, mult, int(zo[0]), lo, hi,
                                      acc_range=_conv_acc_range(
                                          w, tap_axes, in_zp,
                                          np.asarray(bias + pad_corr, np.int64)))

            elif name == "FULLY_CONNECTED":
                if op.options.get("weights_format", 0) != 0:
                    raise NotImplementedError(
                        "FULLY_CONNECTED with shuffled weights format "
                        f"{op.options['weights_format']} is not supported "
                        "(weights would be consumed as row-major garbage)")
                xin = get(ins[0])
                w = get_host(ins[1])  # [out, in]
                if xin.ndim > 2 and len(T[o].shape) < xin.ndim:
                    # TFLite flattens rank>2 inputs to [prod(leading), in];
                    # when the graph DECLARES the flattened (lower-rank)
                    # output, the broadcast dot below would silently produce
                    # a different shape than the interpreter. (Keras-exported
                    # graphs keep the leading dims — KeepNumDims semantics —
                    # where the broadcast dot is bit-identical, fuzz-tested.)
                    raise NotImplementedError(
                        f"FULLY_CONNECTED flattens rank-{xin.ndim} input to "
                        f"rank-{len(T[o].shape)} output; that reshape is not "
                        "replicated")
                bias = get_host(ins[2]).astype(np.int64) if len(ins) > 2 and ins[2] >= 0 else 0
                si, zi, _ = q_params(ins[0])
                sw, _, _ = q_params(ins[1])
                so, zo, _ = q_params(o)
                acc = lax.dot_general(
                    xin, jnp.asarray(w.T),
                    dimension_numbers=(((xin.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                correction = (bias - int(zi[0]) * w.astype(np.int64).sum(axis=1)).astype(np.int64)
                acc = acc + jnp.asarray(correction, jnp.int32)
                mult = si[0] * sw.astype(np.float64) / so[0]  # per-channel or [1]
                lo, hi = _act_bounds(op.options["activation"], float(so[0]), int(zo[0]))
                vals[o] = _requant_op(acc, mult, int(zo[0]), lo, hi,
                                      acc_range=_conv_acc_range(
                                          w, (1,), int(zi[0]),
                                          np.asarray(bias, np.int64)))

            elif name in ("ADD", "SUB"):
                # Exact TFLite int8 ADD/SUB: rescale both inputs to twice
                # the max input scale at 20 fractional bits, integer
                # add/subtract, requantize. The input rescales run in the
                # 2-multiply small-operand form (|code - zp| <= 255,
                # _mbqm_shifted_small); constant operands (e.g. the PWL
                # threshold vectors, reference magnitude.py:99-134) are
                # rescaled ONCE on the host.
                sa, za, _ = q_params(ins[0])
                sb, zb, _ = q_params(ins[1])
                so, zo, _ = q_params(o)
                left_shift = 20
                twice_max = 2.0 * max(float(sa[0]), float(sb[0]))
                qm_a = _quantize_multiplier(float(sa[0]) / twice_max)
                qm_b = _quantize_multiplier(float(sb[0]) / twice_max)
                qm_o = _quantize_multiplier(twice_max / ((1 << left_shift) * float(so[0])))

                def _rescaled(idx, zp, qm_shift):
                    """(rescaled operand, exact host [lo, hi] range)."""
                    info = T[idx]
                    if info.data is not None:
                        x = (np.asarray(info.data, np.int64) - zp) << left_shift
                        r = _mbqm_host(x, *qm_shift)
                        return jnp.asarray(r, jnp.int32), (int(r.min()), int(r.max()))
                    # MBQM is monotone in x, so the code-range endpoints
                    # bound every reachable rescaled value exactly.
                    ends = _mbqm_host(
                        np.array([-128 - zp, 127 - zp], np.int64) << left_shift,
                        *qm_shift)
                    x = get(idx).astype(jnp.int32) - zp
                    return (_add_rescale(x, *qm_shift, pre_shift=left_shift),
                            (int(ends[0]), int(ends[1])))

                ra, (la, ha) = _rescaled(ins[0], int(za[0]), qm_a)
                rb, (lb, hb) = _rescaled(ins[1], int(zb[0]), qm_b)
                if name == "ADD":
                    raw, r_lo, r_hi = ra + rb, la + lb, ha + hb
                else:
                    raw, r_lo, r_hi = ra - rb, la - hb, ha - lb
                q = _mbqm_bounded(raw, *qm_o,
                                  max(abs(r_lo), abs(r_hi))) + int(zo[0])
                lo, hi = _act_bounds(op.options["activation"], float(so[0]), int(zo[0]))
                vals[o] = jnp.clip(q, lo, hi).astype(jnp.int8)

            elif name == "MEAN":
                # TFLite integer Mean kernel (verified against TF 2.21):
                # acc = sum(q - zp_in); MBQM(acc, qmult(si / (num*so))) + zp_out.
                axes = tuple(int(a) for a in np.atleast_1d(get_host(ins[1])))
                keep = op.options["keepdims"]
                si, zi, _ = q_params(ins[0])
                so, zo, _ = q_params(o)
                xin = get(ins[0]).astype(jnp.int32)
                num = int(np.prod([xin.shape[a] for a in axes]))
                acc = jnp.sum(xin - int(zi[0]), axis=axes, keepdims=keep)
                qm, sh = _quantize_multiplier(float(si[0]) / (num * float(so[0])))
                q = _mbqm_bounded(acc, qm, sh,
                                  num * max(128 + int(zi[0]),
                                            127 - int(zi[0]))) + int(zo[0])
                vals[o] = jnp.clip(q, -128, 127).astype(jnp.int8)

            elif name == "MUL":
                # TFLite int8 MUL: int32 product of offset values, one MBQM.
                a, b = get(ins[0]), get(ins[1])
                sa, za, _ = q_params(ins[0])
                sb, zb, _ = q_params(ins[1])
                so, zo, _ = q_params(o)
                prod = (a.astype(jnp.int32) - int(za[0])) * (b.astype(jnp.int32) - int(zb[0]))
                qm = _quantize_multiplier(float(sa[0]) * float(sb[0]) / float(so[0]))
                pb = (max(128 + int(za[0]), 127 - int(za[0]))
                      * max(128 + int(zb[0]), 127 - int(zb[0])))
                q = _mbqm_bounded(prod, *qm, pb) + int(zo[0])
                lo, hi = _act_bounds(op.options["activation"], float(so[0]), int(zo[0]))
                vals[o] = jnp.clip(q, lo, hi).astype(jnp.int8)

            elif name == "DIV":
                # Float-faithful (TFLite's int8 DIV kernel is itself a
                # dequant/div/requant reference path; ~1 LSB).
                a, b = get(ins[0]), get(ins[1])
                sa, za, _ = q_params(ins[0])
                sb, zb, _ = q_params(ins[1])
                so, zo, _ = q_params(o)
                fa = (a.astype(jnp.float32) - int(za[0])) * float(sa[0])
                fb = (b.astype(jnp.float32) - int(zb[0])) * float(sb[0])
                q = _round_away(fa / fb / float(so[0])) + int(zo[0])
                lo, hi = _act_bounds(op.options["activation"], float(so[0]), int(zo[0]))
                vals[o] = jnp.clip(q, lo, hi).astype(jnp.int8)

            elif name == "REDUCE_MAX":
                axes = tuple(int(a) for a in np.atleast_1d(get_host(ins[1])))
                keep = op.options.get("keepdims", True)
                si, zi, _ = q_params(ins[0])
                so, zo, _ = q_params(o)
                m = jnp.max(get(ins[0]), axis=axes, keepdims=keep)
                if float(si[0]) == float(so[0]) and int(zi[0]) == int(zo[0]):
                    vals[o] = m
                else:
                    q = _round_away((m.astype(jnp.float32) - int(zi[0]))
                                    * (float(si[0]) / float(so[0]))) + int(zo[0])
                    vals[o] = jnp.clip(q, -128, 127).astype(jnp.int8)

            elif name == "SUM":
                # Integer sum + one MBQM(si/so) (MEAN without the 1/num).
                axes = tuple(int(a) for a in np.atleast_1d(get_host(ins[1])))
                keep = op.options.get("keepdims", False)
                si, zi, _ = q_params(ins[0])
                so, zo, _ = q_params(o)
                xin = get(ins[0])
                n_red = int(np.prod([xin.shape[a] for a in axes]))
                acc = jnp.sum(xin.astype(jnp.int32) - int(zi[0]),
                              axis=axes, keepdims=keep)
                qm, sh = _quantize_multiplier(float(si[0]) / float(so[0]))
                q = _mbqm_bounded(acc, qm, sh,
                                  n_red * max(128 + int(zi[0]),
                                              127 - int(zi[0]))) + int(zo[0])
                vals[o] = jnp.clip(q, -128, 127).astype(jnp.int8)

            elif name == "RESHAPE":
                new_shape = [int(d) for d in (get_host(ins[1]) if len(ins) > 1 and ins[1] >= 0
                                              else op.options["new_shape"])]
                src = get(ins[0])
                # Respect the executor's actual batch size. A spec exported
                # at batch 1 may carry a literal leading 1; remap it to -1,
                # or to the real batch when the spec's -1 is elsewhere
                # (only one -1 is allowed in a reshape spec).
                if new_shape and new_shape[0] not in (-1, src.shape[0]):
                    new_shape[0] = -1 if -1 not in new_shape[1:] else src.shape[0]
                vals[o] = jnp.reshape(src, new_shape)

            elif name in ("PAD", "PADV2"):
                # TFLite Pad: constant-pad with the OUTPUT zero point for
                # quantized tensors (pad.cc requires input/output params to
                # match), 0.0 for float, or PADV2's explicit constant. The
                # raw frontend's explicit symmetric pad before its VALID
                # conv exports as this op (reference frontend.py:139-171).
                xin = get(ins[0])
                pads = np.asarray(get_host(ins[1]), np.int64).reshape(-1, 2)
                if name == "PADV2" and len(ins) > 2 and ins[2] >= 0:
                    pad_value = get_host(ins[2]).reshape(()).item()
                elif xin.dtype == jnp.float32:
                    pad_value = 0.0
                else:
                    _, zo, _ = q_params(o)
                    pad_value = int(zo[0])
                vals[o] = jnp.pad(
                    xin, [(int(b), int(a)) for b, a in pads],
                    constant_values=pad_value)

            elif name == "SOFTMAX":
                # Float-faithful softmax(beta*x); int8 output scale is 1/256.
                si, zi, _ = q_params(ins[0])
                so, zo, _ = q_params(o)
                beta = float(op.options.get("beta", 1.0))
                f = (get(ins[0]).astype(jnp.float32) - int(zi[0])) * float(si[0])
                p = jax.nn.softmax(beta * f, axis=-1)
                q = _round_away(p / float(so[0])) + int(zo[0])
                vals[o] = jnp.clip(q, -128, 127).astype(jnp.int8)

            elif name == "LOGISTIC":
                si, zi, _ = q_params(ins[0])
                so, zo, _ = q_params(o)
                v = np.arange(-128, 128, dtype=np.float64)
                f = 1.0 / (1.0 + np.exp(-(v - int(zi[0])) * float(si[0])))
                lut = np.clip(np.sign(f / so[0]) * np.floor(np.abs(f / so[0]) + 0.5) + int(zo[0]), -128, 127).astype(np.int8)
                idx = get(ins[0]).astype(jnp.int32) + 128
                vals[o] = jnp.take(jnp.asarray(lut), idx)

            elif name == "LOG":
                # int8 elementwise log via a 256-entry LUT (TFLite
                # elementwise.cc LUTPopulate semantics: evaluate per code,
                # round half away from zero, clamp). Non-positive dequants
                # map to qmin — the graph clamps with MAXIMUM(x, eps) first
                # (the db magnitude scaling, reference magnitude.py:194-200).
                si, zi, _ = q_params(ins[0])
                so, zo, _ = q_params(o)
                v = np.arange(-128, 128, dtype=np.float64)
                xf = (v - int(zi[0])) * float(si[0])
                with np.errstate(divide="ignore", invalid="ignore"):
                    f = np.where(xf > 0.0, np.log(xf), -np.inf)
                q = np.sign(f / so[0]) * np.floor(np.abs(f / so[0]) + 0.5) + int(zo[0])
                lut = np.clip(np.nan_to_num(q, nan=-128.0, neginf=-128.0),
                              -128, 127).astype(np.int8)
                idx = get(ins[0]).astype(jnp.int32) + 128
                vals[o] = jnp.take(jnp.asarray(lut), idx)

            elif name in ("MAXIMUM", "MINIMUM"):
                # TFLite's quantized Maximum/Minimum kernel compares raw
                # int8 codes and requires identical quant params across
                # inputs/outputs; when an exported graph violates that,
                # fall back to a float-faithful compare (<= 1 LSB).
                a, b = get(ins[0]), get(ins[1])
                fn = jnp.maximum if name == "MAXIMUM" else jnp.minimum
                sa, za, _ = q_params(ins[0])
                sb, zb, _ = q_params(ins[1])
                so, zo, _ = q_params(o)
                same = (float(sa[0]) == float(sb[0]) == float(so[0])
                        and int(za[0]) == int(zb[0]) == int(zo[0]))
                if same:
                    vals[o] = fn(a, b)
                else:
                    fa = (a.astype(jnp.float32) - int(za[0])) * float(sa[0])
                    fb = (b.astype(jnp.float32) - int(zb[0])) * float(sb[0])
                    q = _round_away(fn(fa, fb) / float(so[0])) + int(zo[0])
                    vals[o] = jnp.clip(q, -128, 127).astype(jnp.int8)

            else:
                raise NotImplementedError(f"TFLite op {name} not supported")

        if return_all:
            return vals
        return vals[graph.outputs[0]]

    return executor


def load_tflite_model(path, batch_size: int = 1):
    """Parse a .tflite file and return (graph, jitted executor)."""
    graph = TFLiteGraph(path)
    fn = build_executor(graph, batch_size)
    return graph, jax.jit(fn)
