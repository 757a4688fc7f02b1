"""Driver-side all-string table — the reference ``hipipe::dataframe``.

Reference ``include/hipipe/core/dataframe.hpp:40-52``: a column-major
table of strings plus a unique header, with typed *views* cast on
access (``dataframe.hpp:531-556``) and key→value index views for
building lookup maps (``dataframe.hpp:705-798``). This is deliberately
a DRIVER-SIDE structure: in the reference it holds configs, label maps
and CSV heads — dimension-sized data, never the corpus. The corpus
path is :func:`hipipe_spark.sources.csv.read_csv` → Spark DataFrame;
:meth:`StringFrame.to_spark` / :func:`from_spark` bridge the two, and
:meth:`index_col` feeds ``F.broadcast`` joins / ``create_map`` lookups
(the Spark reading of the reference's index views).

Semantics pinned by ``/root/reference/test/core/dataframe.cpp``:
rectangularity + unique non-empty header enforced, typed access by
name or index, insert/drop of rows and columns, tolerant bool parse.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

_TRUE = {"true", "1", "y", "yes", "on"}
_FALSE = {"false", "0", "n", "no", "off"}


def py_string_to(s: str, ty: type | Callable[[str], Any]):
    """Driver-side `string_to<T>` (reference ``string.hpp:32-82``):
    int/float via lexical cast, tolerant bool set, custom callables
    pass through."""
    if ty is bool:
        t = s.strip().lower()
        if t in _TRUE:
            return True
        if t in _FALSE:
            return False
        raise ValueError(f"Failed to convert string {s!r} to bool.")
    return ty(s)


def py_to_string(v: Any) -> str:
    """Driver-side `to_string` (reference ``string.hpp:95-125``):
    bools render as true/false (dataframe.cpp:104 expects 'true')."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


class StringFrame:
    """Column-major all-string table with typed cast-on-read views."""

    def __init__(self, columns: Sequence[Sequence[Any]],
                 header: Sequence[str] | None = None):
        self._data: list[list[str]] = [
            [py_to_string(v) for v in col] for col in columns]
        if self._data:
            n = len(self._data[0])
            if any(len(c) != n for c in self._data):
                raise ValueError("all columns must have equal length")
        if header is not None:
            header = list(header)
            if len(header) != len(self._data):
                raise ValueError("header size must match column count")
            if any(h == "" for h in header):
                raise ValueError("header entries must be non-empty")
            if len(set(header)) != len(header):
                raise ValueError("header entries must be unique")
        self._header: list[str] | None = header

    # ---- shape / raw access (dataframe.hpp:342-427)
    @property
    def n_cols(self) -> int:
        return len(self._data)

    @property
    def n_rows(self) -> int:
        return len(self._data[0]) if self._data else 0

    def header(self) -> list[str]:
        return list(self._header) if self._header else []

    def _col_index(self, name: str) -> int:
        if not self._header or name not in self._header:
            raise KeyError(name)
        return self._header.index(name)

    def raw_icol(self, i: int) -> list[str]:
        if not 0 <= i < self.n_cols:
            raise IndexError(i)
        return list(self._data[i])

    def raw_col(self, name: str) -> list[str]:
        return self.raw_icol(self._col_index(name))

    def raw_cols(self) -> list[list[str]]:
        return [list(c) for c in self._data]

    def raw_rows(self) -> list[list[str]]:
        return [[self._data[j][i] for j in range(self.n_cols)]
                for i in range(self.n_rows)]

    # ---- typed views (dataframe.hpp:428-457, 653-682)
    def icol(self, i: int, ty: type = str) -> list:
        return [py_string_to(v, ty) for v in self.raw_icol(i)]

    def col(self, name: str, ty: type = str) -> list:
        return self.icol(self._col_index(name), ty)

    def icols(self, idxs: Sequence[int], types: Sequence[type]) -> tuple:
        return tuple(self.icol(i, t) for i, t in zip(idxs, types))

    def cols(self, names: Sequence[str], types: Sequence[type]) -> tuple:
        return self.icols([self._col_index(n) for n in names], types)

    def rows(self, names: Sequence[str], types: Sequence[type]) -> list[tuple]:
        return list(zip(*self.cols(names, types)))

    # ---- mutation (dataframe.hpp:238-327)
    def insert_col(self, values: Sequence[Any], name: str | None = None) -> None:
        if self._header is not None and name is None:
            raise ValueError("header present: new column needs a name")
        if self._header is None and name is not None:
            raise ValueError("frame has no header: column must be unnamed")
        if self._data and len(values) != self.n_rows:
            raise ValueError("column length must equal n_rows")
        # validate BEFORE mutating: a rejected duplicate name must not
        # leave the frame with one more data column than header entries
        if self._header is not None and name in self._header:
            raise ValueError(f"duplicate column {name!r}")
        self._data.append([py_to_string(v) for v in values])
        if self._header is not None:
            self._header.append(name)

    def drop_icol(self, i: int) -> None:
        if not 0 <= i < self.n_cols:
            raise IndexError(i)
        del self._data[i]
        if self._header is not None:
            del self._header[i]

    def drop_col(self, name: str) -> None:
        self.drop_icol(self._col_index(name))

    def insert_row(self, values: Sequence[Any]) -> None:
        if len(values) != self.n_cols:
            raise ValueError("row length must equal n_cols")
        for j, v in enumerate(values):
            self._data[j].append(py_to_string(v))

    def drop_row(self, i: int) -> None:
        if not 0 <= i < self.n_rows:
            raise IndexError(i)
        for c in self._data:
            del c[i]

    # ---- index views → lookup maps (dataframe.hpp:705-798)
    def index_col(self, key: str, val: str, key_ty: type = str,
                  val_ty: type = str) -> dict:
        return dict(zip(self.col(key, key_ty), self.col(val, val_ty)))

    def index_cols(self, key: str, vals: Sequence[str], key_ty: type = str,
                   val_tys: Sequence[type] | None = None) -> dict:
        val_tys = list(val_tys or [str] * len(vals))
        cols = self.cols(vals, val_tys)
        return {k: tup for k, tup in zip(self.col(key, key_ty), zip(*cols))}

    # ---- Spark bridge
    def to_spark(self, spark, types: dict[str, str] | None = None):
        """All-string Spark DataFrame (optionally typed via
        :func:`hipipe_spark.sources.csv.typed`)."""
        header = self._header or [f"_c{i}" for i in range(self.n_cols)]
        schema = ", ".join(f"`{h}` string" for h in header)
        df = spark.createDataFrame(self.raw_rows(), schema)
        if types:
            from hipipe_spark.sources.csv import typed
            df = typed(df, {**{h: "string" for h in header}, **types})
        return df


def from_spark(df) -> StringFrame:
    """Collect a (dimension-sized!) Spark DataFrame into a StringFrame —
    the reverse bridge; intended for label maps / configs, not corpora."""
    rows = df.collect()
    cols = [[("" if r[j] is None else r[j]) for r in rows]
            for j in range(len(df.columns))]
    return StringFrame(cols, list(df.columns))
