"""Evaluation-form polynomial layer (Lagrange basis), device-resident.

TPU-native counterpart of the reference's layer 1 (SURVEY.md §1):
``vector-commit/src/lagrange_basis.rs`` + ``src/precompute.rs``.
"""

from .domain import Domain
from .lagrange import FrVector

__all__ = ["Domain", "FrVector"]
