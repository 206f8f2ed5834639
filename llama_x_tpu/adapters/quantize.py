"""int8 weight quantization as a param-tree transform (≡ quantize_linear_,
subclasses/__init__.py:6-13): every linear's bf16 kernel [.., in, out] is replaced by
{int_data int8 [.., out, in], scale [.., out]}. Composition order matters and is the
caller's contract: quantize FIRST, then apply_linear_adapter → int8 frozen base + bf16
trainable LoRA (QLoRA-style), same as train_metamathqa.py:178-179.

``dynamic_int8_act`` selects the int8xint8 dynamic-activation-quant GEMM at apply time;
thread it into LlamaConfig.dynamic_int8_act (the static knob the model passes to
apply_linear)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llama_x_tpu.adapters.lora import _map_linears
from llama_x_tpu.ops.int8 import quantize_int8_rowwise


def quantize_linear(layers_params: dict, method: str | None, **kwargs) -> dict:
    if method is None:
        return layers_params
    assert method == "int8", f"unknown quantization method {method!r}"
    return _quantize_int8(layers_params)


def _quantize_int8(layers_params: dict) -> dict:
    def quantize(lin: dict, path: str) -> dict:
        assert "int_data" not in lin, f"{path} already quantized"
        kernel = lin["kernel"]  # [.., in, out]
        w = jnp.swapaxes(kernel, -1, -2)  # [.., out, in] — rowwise over out-features
        lead = w.shape[:-2]
        w2 = w.reshape(-1, w.shape[-1])
        int_data, scale = quantize_int8_rowwise(w2)
        new = {k: v for k, v in lin.items() if k != "kernel"}
        new["int_data"] = int_data.reshape(*lead, *w.shape[-2:])
        new["scale"] = scale.reshape(*lead, w.shape[-2]).astype(kernel.dtype)
        return new

    return _map_linears(layers_params, quantize)
