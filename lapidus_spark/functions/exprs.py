"""Expression helpers shared by the extension operators.

``let_`` emulates a let-binding in Spark SQL expressions: Catalyst's
CollapseProject inlines column aliases into every downstream
reference, so an expensive subexpression (an md5 pass over an array)
referenced by N projections is recomputed N times. Wrapping it as a
one-element array and binding it to a lambda variable forces exactly
one evaluation, with no cache/persist side effects:

    let_("transform(sh, s -> md5(s))", "hs", "<body using hs>")
    ≡ element_at(transform(array(<expr>), hs -> <body>), 1)
"""

from __future__ import annotations


def let_(binding: str, var: str, body: str) -> str:
    return f"element_at(transform(array({binding}), {var} -> {body}), 1)"
