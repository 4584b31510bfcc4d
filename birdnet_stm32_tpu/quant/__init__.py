"""INT8 quantization: fake-quant QAT, PTQ calibration, TFLite-graph executor."""
