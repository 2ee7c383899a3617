"""TPU Pallas kernels for the GAT hot path (SURVEY.md §7.7).

- segment_attention: fused exp -> segment denominator -> weighted SpMM
  (normalised and unnormalised/partial variants, custom VJPs)
- segment_sum: generic sorted segment reduction on the MXU
- gather: row gather whose VJP reduces via the sorted segment-sum
"""

from .gather import gather_rows_src_sorted  # noqa: F401
from .segment_attention import (  # noqa: F401
    fused_segment_attention, fused_segment_attention_partial,
    reference_segment_attention,
)
from .segment_sum import segment_sum_pallas  # noqa: F401
