"""The ``commalist`` template DSL.

The reference drives every report through 2-D template strings: rows
separated by ``;``, columns by ``,`` (reference ``_gui.py:106-138``,
class ``commalist``).  A template row is ``var[,op[,weight...]]`` with an
optional ``var=alias`` rename (reference ``bm_breakdown.py:39,83-84``).

This is pure driver-side Python (no Spark), kept bug-for-bug compatible
with the reference's parser so existing template strings work unchanged.
"""

from __future__ import annotations

ROW_SEP = ";"
COL_SEP = ","
LABEL = "="  # alias separator, reference bm_breakdown.py:39


def parse_commalist(arg) -> list[list[str]]:
    """Parse a ``;``/``,`` 2-D template string into a list of rows.

    Mirrors ``commalist.parse`` (reference ``_gui.py:106-117``): a string is
    split into rows on ``;`` and columns on ``,``; a list input is passed
    through (each row coerced to ``list``).
    """
    if isinstance(arg, str):
        return [row.split(COL_SEP) for row in arg.split(ROW_SEP)]
    return [list(row) if isinstance(row, (list, tuple)) else [str(row)] for row in arg]


class commalist(list):
    """list subclass with the reference's string round-trip behavior
    (reference ``_gui.py:105-137``): ``str()`` joins columns with ``,`` and
    rows with ``;``; ``split()`` returns one joined string per row;
    truthiness is based on the string form (a single ``['']`` row is falsy).
    """

    def parse(self, arg):
        del self[:]
        self.extend(parse_commalist(arg))
        return self

    def __str__(self) -> str:
        out = []
        for row in self:
            out.append(COL_SEP.join(row) if isinstance(row, list) else str(row))
        return ROW_SEP.join(out)

    def __bool__(self) -> bool:
        return len(str(self)) > 0

    def split(self, *args) -> list[str]:
        return [COL_SEP.join(row) for row in self]


def split_alias(token: str) -> tuple[str, str]:
    """``'volume=total_volume'`` -> ``('volume', 'total_volume')``.

    Reference ``bm_breakdown.py:83-84``: the alias separator must appear at
    position > 0 (a leading ``=`` is not an alias).
    """
    if token and token.find(LABEL) > 0:
        var, alias = token.split(LABEL, 1)
        return var, alias
    return token, ""
