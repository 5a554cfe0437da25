"""Zonotopes: center + generator columns (reference `zonotope.py:11-171`).

Kept as a small NumPy object for API parity (Minkowski sum, linear map,
scalar scaling, interval hull, containment, vertex enumeration); the hot
set-propagation path never materialises these objects — see
`interval_fft.propagate_through_deconvolution`.
"""

from __future__ import annotations

import itertools

import numpy as np

__all__ = ["Zonotope"]


class Zonotope:
    def __init__(self, center, generators):
        self.center = np.asarray(center, dtype=float)
        gens = np.asarray(generators, dtype=float)
        if gens.ndim == 1:
            gens = gens[:, None]
        self.generators = gens  # [dim, n_gen]
        self.dim = self.center.shape[0]

    @classmethod
    def from_interval(cls, lo: float, hi: float):
        """Real interval as a 2-D (re, im) zonotope on the real axis
        (intervalFFT.py:30-51)."""
        center = np.array([(lo + hi) / 2.0, 0.0])
        gen = np.array([[(hi - lo) / 2.0], [0.0]])
        return cls(center, gen)

    # -- operations --------------------------------------------------------
    def __add__(self, other: "Zonotope") -> "Zonotope":
        """Minkowski sum: add centers, concatenate generators."""
        return Zonotope(self.center + other.center,
                        np.hstack((self.generators, other.generators)))

    def __mul__(self, scalar: float) -> "Zonotope":
        return Zonotope(scalar * self.center, scalar * self.generators)

    __rmul__ = __mul__

    def linear_map(self, matrix) -> "Zonotope":
        m = np.asarray(matrix, dtype=float)
        return Zonotope(m @ self.center, m @ self.generators)

    # -- queries ------------------------------------------------------------
    def interval_hull(self):
        """Per-dimension bounds: center +- sum(|generators|)."""
        rad = np.abs(self.generators).sum(axis=1)
        return self.center - rad, self.center + rad

    def contains(self, point, tol: float = 1e-9) -> bool:
        """Exact containment via LP feasibility (||xi||_inf <= 1 s.t.
        G xi = p - c); falls back to the interval hull when scipy's linprog
        is unavailable."""
        p = np.asarray(point, dtype=float) - self.center
        G = self.generators
        try:
            from scipy.optimize import linprog

            n = G.shape[1]
            # minimise 0 s.t. G xi = p, -1 <= xi <= 1
            res = linprog(np.zeros(n), A_eq=G, b_eq=p,
                          bounds=[(-1, 1)] * n, method="highs")
            return bool(res.success)
        except ImportError:
            lo, hi = self.interval_hull()
            return bool(np.all(point >= lo - tol) and np.all(point <= hi + tol))

    def vertices(self, max_generators: int = 12):
        """Vertex enumeration by sign combinations + convex hull
        (zonotope.py:27-56); random sign sampling past `max_generators`."""
        n = self.generators.shape[1]
        if n > max_generators:
            rng = np.random.RandomState(0)
            coeffs = np.sign(rng.uniform(-1, 1, (1024, n)))
        else:
            coeffs = np.array(list(itertools.product((-1.0, 1.0), repeat=n)))
        pts = self.center + coeffs @ self.generators.T
        if self.dim <= 1 or n <= 1:
            return pts
        try:
            from scipy.spatial import ConvexHull

            hull = ConvexHull(pts)
            return pts[hull.vertices]
        except Exception:
            return pts
