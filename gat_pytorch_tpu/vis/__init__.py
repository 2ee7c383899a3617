"""Attention analysis & visualisation (reference L6, SURVEY.md §2.10-2.13).

`attention` — extraction + statistics (entropies, degree-scaled weights,
neighbourhood slices); `plots` — the three matplotlib figures (entropy
dual histogram, neighbourhood star plot, weight histogram).
"""

from . import attention, plots

__all__ = ["attention", "plots"]
