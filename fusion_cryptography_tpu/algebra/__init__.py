"""Drop-in import surface mirroring the reference's ``algebra`` package.

Users of the reference write ``from algebra.ntt import cooley_tukey_ntt`` and
``from algebra.polynomials import PolynomialCoefficientRepresentation``; after
switching to this framework the same names live here:

    from fusion_cryptography_tpu.algebra.ntt import cooley_tukey_ntt
    from fusion_cryptography_tpu.algebra.polynomials import ...
    from fusion_cryptography_tpu.algebra.matrices import GeneralMatrix
"""
from . import matrices, ntt, polynomials
