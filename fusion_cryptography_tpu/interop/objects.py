"""Object-level compatibility layer: the reference's public classes, re-hosted.

Users of the reference library (`algebra.polynomials`, `algebra.matrices`) get
the same class names, constructor signatures, operator algebra, validation
errors, and — critically — the same ``str``/``repr`` wire format (the hash
pipeline serializes through it, fusion/fusion.py:417).  Internally these are
thin wrappers over the tensor core: multiplication routes through the jitted
NTT kernels instead of the reference's O(d²) schoolbook loops
(algebra/polynomials.py:196-208), and validation uses cached O(#prime-factors)
primitive-root checks instead of the reference's O(root_order) pow loop per
object construction (algebra/polynomials.py:40).

The classes masquerade as ``algebra.polynomials.*`` via ``__module__`` so that
``repr(type(x))`` — which the reference embeds inside hashed GeneralMatrix
reprs (algebra/matrices.py:40-41) — matches byte-for-byte.
"""
from __future__ import annotations

from typing import List, Union

import jax.numpy as jnp
import numpy as np

from ..ops import numtheory
from ..ops.ntt import make_plan, negacyclic_poly_mult, ntt_fwd, ntt_inv
from . import serial


def _validate_ring(modulus, degree, root, inv_root, root_order):
    for name, v in (("modulus", modulus), ("degree", degree), ("root", root),
                    ("inv_root", inv_root), ("root_order", root_order)):
        if not isinstance(v, int) or isinstance(v, bool):
            raise TypeError(f"{name} must be an int")
    if (modulus - 1) % root_order != 0:
        raise ValueError("root_order must be a divisor of modulus - 1")
    if pow(root, root_order, modulus) != 1:
        raise ValueError("root must be a root of unity of order root_order")
    if not numtheory.is_primitive_root(root, modulus, root_order):
        raise ValueError("root must be a primitive root of unity of order root_order")
    if (root * inv_root) % modulus != 1:
        raise ValueError("root and inv_root must be inverses of each other")


class _PolyBase:
    """Shared ring metadata + centered reduction helpers."""

    __slots__ = ("modulus", "degree", "root", "inv_root", "root_order")

    def __init__(self, modulus: int, degree: int, root: int, inv_root: int, root_order: int):
        _validate_ring(modulus, degree, root, inv_root, root_order)
        self.modulus = modulus
        self.degree = degree
        self.root = root
        self.inv_root = inv_root
        self.root_order = root_order

    @property
    def halfmod(self) -> int:
        return self.modulus // 2

    @property
    def logmod(self) -> int:
        return self.modulus.bit_length() - 1

    def _same_ring(self, other) -> bool:
        return (
            self.modulus == other.modulus
            and self.degree == other.degree
            and self.root == other.root
            and self.root_order == other.root_order
        )

    def _require_same_ring(self, other, op: str):
        if self.modulus != other.modulus:
            raise NotImplementedError(f"Cannot {op} polynomials with different moduli")
        if self.degree != other.degree:
            raise NotImplementedError(f"Cannot {op} polynomials with different degrees")
        if self.root != other.root:
            raise NotImplementedError(f"Cannot {op} polynomials with different roots of unity")
        if self.root_order != other.root_order:
            raise NotImplementedError(f"Cannot {op} polynomials with different root orders")

    def _cent_list(self, vals: List[int]) -> List[int]:
        q = self.modulus
        h = q // 2
        return [((v % q) - q) if (v % q) > h else (v % q) for v in vals]

    def _plan(self):
        return make_plan(self.modulus, self.degree, self.root)


def _check_int_list(vals, what: str, degree: int):
    if not isinstance(vals, list):
        raise TypeError(f"{what} must be a list")
    if not all(isinstance(x, int) and not isinstance(x, bool) for x in vals):
        raise TypeError(f"{what} must be a list of ints")
    if len(vals) != degree:
        raise ValueError(f"{what} must be of length degree")


class PolynomialCoefficientRepresentation(_PolyBase):
    """Coefficient-domain polynomial over Z_q[X]/(X^d + 1).

    Behavioral twin of reference algebra/polynomials.py:65-227; multiplication
    is NTT-based (exact: residues agree, centered canonical form is unique).
    """

    __slots__ = ("coefficients",)

    def __init__(self, modulus, degree, root, inv_root, root_order, coefficients):
        super().__init__(modulus, degree, root, inv_root, root_order)
        _check_int_list(coefficients, "coefficients", degree)
        self.coefficients = coefficients

    def __str__(self):
        return serial.poly_coef_str(
            self.modulus, self.degree, self.root, self.inv_root, self.root_order, self.coefficients
        )

    __repr__ = __str__

    def __eq__(self, other):
        if not isinstance(other, PolynomialCoefficientRepresentation):
            return False
        if not self._same_ring(other):
            return False
        return all((x - y) % self.modulus == 0 for x, y in zip(self.coefficients, other.coefficients))

    def __hash__(self):
        return hash((self.modulus, self.degree, tuple(c % self.modulus for c in self.coefficients)))

    def _with(self, coefficients: List[int]) -> "PolynomialCoefficientRepresentation":
        return PolynomialCoefficientRepresentation(
            modulus=self.modulus, degree=self.degree, root=self.root,
            inv_root=self.inv_root, root_order=self.root_order, coefficients=coefficients,
        )

    def __add__(self, other):
        if other == 0:
            return self
        if not isinstance(other, PolynomialCoefficientRepresentation):
            raise NotImplementedError(
                f"Addition for {type(self)} and {type(other)} not implemented"
            )
        self._require_same_ring(other, "add")
        return self._with(self._cent_list([x + y for x, y in zip(self.coefficients, other.coefficients)]))

    def __radd__(self, other):
        if other == 0:
            return self
        return self + other

    def __neg__(self):
        return self._with([-(x % self.modulus) for x in self.coefficients])

    def __sub__(self, other):
        return self + (-other)

    def __rsub__(self, other):
        return other + (-self)

    def __mul__(self, other):
        if other == 0:
            return 0
        if other == 1:
            return self
        if not isinstance(other, PolynomialCoefficientRepresentation):
            raise NotImplementedError(
                f"Multiplication for {type(self)} and {type(other)} not implemented"
            )
        self._require_same_ring(other, "multiply")
        plan = self._plan()
        a = np.array(self._cent_list(self.coefficients), dtype=np.int32)
        b = np.array(self._cent_list(other.coefficients), dtype=np.int32)
        out = np.asarray(negacyclic_poly_mult(plan, jnp.asarray(a), jnp.asarray(b)))
        return self._with([int(v) for v in out])

    def __rmul__(self, other):
        return self.__mul__(other)

    def norm(self, p: Union[int, str]) -> int:
        if p != "infty":
            raise NotImplementedError(f"norm for p={p} not implemented")
        return max(abs(x) for x in self.coefficients)

    def weight(self) -> int:
        return sum(1 for x in self.coefficients if x % self.modulus != 0)


class PolynomialNTTRepresentation(_PolyBase):
    """NTT-domain polynomial (bit-reversed evaluation order).

    Behavioral twin of reference algebra/polynomials.py:230-388."""

    __slots__ = ("values",)

    def __init__(self, modulus, degree, root, inv_root, root_order, values):
        super().__init__(modulus, degree, root, inv_root, root_order)
        _check_int_list(values, "values", degree)
        self.values = values

    def __str__(self):
        return serial.poly_ntt_str(
            self.modulus, self.degree, self.root, self.inv_root, self.root_order, self.values
        )

    __repr__ = __str__

    def __eq__(self, other):
        if other == 0:
            return all(x % self.modulus == 0 for x in self.values)
        if not isinstance(other, PolynomialNTTRepresentation):
            return False
        if not self._same_ring(other) or self.inv_root != other.inv_root:
            return False
        if len(self.values) != len(other.values):
            return False
        return all((x - y) % self.modulus == 0 for x, y in zip(self.values, other.values))

    def __hash__(self):
        return hash((self.modulus, self.degree, tuple(v % self.modulus for v in self.values)))

    def _with(self, values: List[int]) -> "PolynomialNTTRepresentation":
        return PolynomialNTTRepresentation(
            modulus=self.modulus, degree=self.degree, root=self.root,
            inv_root=self.inv_root, root_order=self.root_order, values=values,
        )

    def __add__(self, other):
        if other == 0:
            return self
        if not isinstance(other, PolynomialNTTRepresentation):
            raise NotImplementedError(
                f"Addition for {type(self)} and {type(other)} not implemented"
            )
        self._require_same_ring(other, "add")
        if len(self.values) != len(other.values):
            raise NotImplementedError("Cannot add polynomials with different lengths")
        return self._with(self._cent_list([x + y for x, y in zip(self.values, other.values)]))

    def __radd__(self, other):
        if other == 0:
            return self
        return self + other

    def __neg__(self):
        return self._with([-(x % self.modulus) for x in self.values])

    def __sub__(self, other):
        return self + (-other)

    def __rsub__(self, other):
        return other + (-self)

    def __mul__(self, other):
        if other == 0:
            return 0
        if other == 1:
            return self
        if not isinstance(other, PolynomialNTTRepresentation):
            raise NotImplementedError(
                f"Multiplication for {type(self)} and {type(other)} not implemented"
            )
        self._require_same_ring(other, "multiply")
        if len(self.values) != len(other.values):
            raise NotImplementedError(
                "Multiplication with different lengths not implemented"
            )
        q = self.modulus
        h = q // 2
        out = []
        for x, y in zip(self.values, other.values):
            v = (x * y) % q
            out.append(v - q if v > h else v)
        return self._with(out)

    def __rmul__(self, other):
        return self.__mul__(other)


# Masquerade as the reference module so repr(type(...)) — embedded in hashed
# GeneralMatrix reprs — matches the wire format exactly.
PolynomialCoefficientRepresentation.__module__ = "algebra.polynomials"
PolynomialNTTRepresentation.__module__ = "algebra.polynomials"


def transform(x):
    """NTT <-> coefficient domain involution (reference algebra/polynomials.py:391-433),
    routed through the jitted tensor kernels."""
    if isinstance(x, PolynomialCoefficientRepresentation):
        plan = make_plan(x.modulus, x.degree, x.root)
        a = np.array(x._cent_list(x.coefficients), dtype=np.int32)
        vals = np.asarray(ntt_fwd(plan, jnp.asarray(a)))
        return PolynomialNTTRepresentation(
            modulus=x.modulus, degree=x.degree, root=x.root, inv_root=x.inv_root,
            root_order=x.root_order, values=[int(v) for v in vals],
        )
    if isinstance(x, PolynomialNTTRepresentation):
        plan = make_plan(x.modulus, x.degree, x.root)
        a = np.array(x._cent_list(x.values), dtype=np.int32)
        coefs = np.asarray(ntt_inv(plan, jnp.asarray(a)))
        return PolynomialCoefficientRepresentation(
            modulus=x.modulus, degree=x.degree, root=x.root, inv_root=x.inv_root,
            root_order=x.root_order, coefficients=[int(v) for v in coefs],
        )
    raise NotImplementedError(f"Transform for {type(x)} not implemented")


def sample_polynomial_coefficient_representation(
    modulus, degree, root, inv_root, root_order, norm_bound, weight_bound, seed
):
    """Object-returning seeded sampler (reference algebra/polynomials.py:436-467)."""
    from ..hashing.sampler import sample_short_poly_coeffs

    coefs = sample_short_poly_coeffs(modulus, degree, norm_bound, weight_bound, seed)
    return PolynomialCoefficientRepresentation(
        modulus=modulus, degree=degree, root=root, inv_root=inv_root,
        root_order=root_order, coefficients=[int(c) for c in coefs],
    )


def sample_polynomial_ntt_representation(modulus, degree, root, inv_root, root_order, seed):
    """Object-returning uniform NTT sampler (reference algebra/polynomials.py:470-488)."""
    from ..hashing.sampler import sample_uniform_ntt_values

    vals = sample_uniform_ntt_values(modulus, degree, seed)
    return PolynomialNTTRepresentation(
        modulus=modulus, degree=degree, root=root, inv_root=inv_root,
        root_order=root_order, values=[int(v) for v in vals],
    )


# ---------------------------------------------------------------------------
# GeneralMatrix
# ---------------------------------------------------------------------------


def is_algebraic_class(cls) -> bool:
    """Duck-type check for ring-element classes (reference algebra/matrices.py:5-7)."""
    return all(hasattr(cls, m) for m in ("__eq__", "__add__", "__neg__", "__sub__", "__mul__"))


class GeneralMatrix:
    """Element-type-generic matrix (behavioral twin of algebra/matrices.py:10-153).

    Kept list-of-lists and duck-typed for API parity; the scheme's hot paths do
    not use this class (they run on dense tensors) — it exists for users of the
    reference's algebra API and for serialization parity.
    """

    def __init__(self, matrix):
        if not isinstance(matrix, list):
            raise ValueError("Matrix must be a list")
        if not matrix:
            raise ValueError("Matrix must not be empty.")
        if any(not isinstance(row, list) for row in matrix):
            raise ValueError("Matrix must be a list of lists")
        if any(not row for row in matrix):
            raise ValueError("Matrix must not contain empty lists")
        if not all(len(row) == len(matrix[0]) for row in matrix):
            raise ValueError("All rows must have the same length")
        first_cls = matrix[0][0].__class__
        if not is_algebraic_class(first_cls):
            raise ValueError("Matrix must contain only instances of the same algebraic class")
        if not all(isinstance(item, first_cls) for row in matrix for item in row):
            raise ValueError("Matrix must contain only instances of the same algebraic class")
        self.elem_class = first_cls
        self.matrix = matrix

    # -- container protocol -------------------------------------------------
    def __len__(self):
        return len(self.matrix)

    def __iter__(self):
        return iter(self.matrix)

    def __getitem__(self, item):
        return self.matrix[item]

    def __setitem__(self, key, value):
        self.matrix[key] = value

    def __delitem__(self, key):
        # Quirk parity: the reference zeroes the row instead of deleting it
        # (algebra/matrices.py:58-59).
        self.matrix[key] = 0

    def __str__(self):
        return serial.matrix_str(
            repr(self.elem_class), ((str(item) for item in row) for row in self.matrix)
        )

    __repr__ = __str__

    # -- algebra ------------------------------------------------------------
    def __eq__(self, other):
        if other == 0:
            return all(item == 0 for row in self.matrix for item in row)
        if not isinstance(other, GeneralMatrix) or self.elem_class != other.elem_class:
            return False
        if len(self.matrix) != len(other.matrix) or len(self.matrix[0]) != len(other.matrix[0]):
            return False
        return self.matrix == other.matrix

    def _map(self, fn):
        return GeneralMatrix(matrix=[[fn(item) for item in row] for row in self.matrix])

    def _zip(self, other, fn):
        return GeneralMatrix(
            matrix=[
                [fn(a, b) for a, b in zip(ra, rb)] for ra, rb in zip(self.matrix, other.matrix)
            ]
        )

    def __add__(self, other):
        if other == 0:
            return self
        if not isinstance(other, GeneralMatrix) or self.elem_class != other.elem_class:
            raise NotImplementedError(
                "Can only add GeneralMatrix objects of the same algebraic class"
            )
        if len(self.matrix) != len(other.matrix) or len(self.matrix[0]) != len(other.matrix[0]):
            raise ValueError("Matrix dimensions must match")
        return self._zip(other, lambda a, b: a + b)

    def __radd__(self, other):
        if other == 0:
            return self
        return self + other

    def __neg__(self):
        return self._map(lambda a: -a)

    def __sub__(self, other):
        return self + (-other)

    def __mul__(self, other):
        if isinstance(other, self.elem_class):
            return self._map(lambda a: a * other)
        if not isinstance(other, GeneralMatrix) or self.elem_class != other.elem_class:
            raise TypeError("Can only multiply matrices of the same algebraic class")
        if len(self.matrix[0]) != len(other.matrix):
            raise ValueError("Matrix dimension mismatch")
        rows, inner, cols = len(self.matrix), len(other.matrix), len(other.matrix[0])
        out = [
            [
                sum((self.matrix[i][k] * other.matrix[k][j] for k in range(1, inner)),
                    start=self.matrix[i][0] * other.matrix[0][j])
                for j in range(cols)
            ]
            for i in range(rows)
        ]
        return GeneralMatrix(matrix=out)

    def __mod__(self, other):
        if not isinstance(other, int):
            raise TypeError("Can only take the remainder of a matrix with an integer")
        if other <= 1:
            raise ValueError("Modulus must be greater than 1")
        return self._map(lambda a: a % other)

    def norm(self, p: Union[int, str]):
        if not all(hasattr(item, "norm") for row in self.matrix for item in row):
            raise NotImplementedError("Matrix elements must have a norm method")
        if p == "infty":
            return max(item.norm(p=p) for row in self.matrix for item in row)
        return None

    def weight(self):
        if not all(hasattr(item, "weight") for row in self.matrix for item in row):
            raise NotImplementedError("Matrix elements must have a weight method")
        return max(item.weight() for row in self.matrix for item in row)


GeneralMatrix.__module__ = "algebra.matrices"
