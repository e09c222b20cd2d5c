"""GGUF quantization codecs, native cores, goldens and device layouts."""

from .q8_0 import quantize_q8_0, dequantize_q8_0
from .q8_1 import quantize_q8_1, dequantize_q8_1, parse_q8_1
from .q2_k import quantize_q2_k, dequantize_q2_k, parse_q2_k
from .q3_k import quantize_q3_k, dequantize_q3_k, parse_q3_k
from .q4_k import quantize_q4_k, dequantize_q4_k, parse_q4_k
from .q5_k import quantize_q5_k, dequantize_q5_k, parse_q5_k
from .legacy import (quantize_q4_0, dequantize_q4_0, parse_q4_0,
                     quantize_q4_1, dequantize_q4_1, parse_q4_1,
                     quantize_q5_0, dequantize_q5_0, parse_q5_0,
                     quantize_q5_1, dequantize_q5_1, parse_q5_1)
from .q6_k import quantize_q6_k, dequantize_q6_k, parse_q6_k
from .iq4 import (quantize_iq4_nl, dequantize_iq4_nl, parse_iq4_nl,
                  quantize_iq4_xs, dequantize_iq4_xs, parse_iq4_xs)
from .golden import (
    mmq_q8_0_q8_1_golden,
    mmq_q2_k_q8_1_golden,
    mmq_q3_k_q8_1_golden,
    mmq_q4_k_q8_1_golden,
    mmq_q5_k_q8_1_golden,
    mmq_q6_k_q8_1_golden,
    mmq_q4_0_q8_1_golden,
    mmq_q4_1_q8_1_golden,
    mmq_q5_0_q8_1_golden,
    mmq_q5_1_q8_1_golden,
    mmq_iq4_nl_q8_1_golden,
    mmq_iq4_xs_q8_1_golden,
)

__all__ = [
    "quantize_q8_0", "dequantize_q8_0",
    "quantize_q8_1", "dequantize_q8_1", "parse_q8_1",
    "quantize_q2_k", "dequantize_q2_k", "parse_q2_k",
    "quantize_q3_k", "dequantize_q3_k", "parse_q3_k",
    "quantize_q4_k", "dequantize_q4_k", "parse_q4_k",
    "quantize_q5_k", "dequantize_q5_k", "parse_q5_k",
    "quantize_q4_0", "dequantize_q4_0", "parse_q4_0",
    "quantize_q4_1", "dequantize_q4_1", "parse_q4_1",
    "quantize_q5_0", "dequantize_q5_0", "parse_q5_0",
    "quantize_q5_1", "dequantize_q5_1", "parse_q5_1",
    "quantize_q6_k", "dequantize_q6_k", "parse_q6_k",
    "mmq_q8_0_q8_1_golden", "mmq_q2_k_q8_1_golden", "mmq_q3_k_q8_1_golden",
    "mmq_q4_k_q8_1_golden", "mmq_q5_k_q8_1_golden", "mmq_q6_k_q8_1_golden",
    "mmq_q4_0_q8_1_golden", "mmq_q4_1_q8_1_golden", "mmq_q5_0_q8_1_golden",
    "mmq_q5_1_q8_1_golden",
    "quantize_iq4_nl", "dequantize_iq4_nl", "parse_iq4_nl",
    "quantize_iq4_xs", "dequantize_iq4_xs", "parse_iq4_xs",
    "mmq_iq4_nl_q8_1_golden", "mmq_iq4_xs_q8_1_golden",
]
