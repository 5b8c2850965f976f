"""Column typing policy: user-tunable type shaping at the write boundary.

Reference: ``core/dbio/iop/datatype.go:2508-2664`` (ColumnTyping —
StringColumnTyping.Apply / DecimalColumnTyping.Apply / JsonColumnTyping /
BooleanColumnTyping), wired via the ``column_typing`` target option.

Two halves, matching how Spark splits the concern:

- **DataFrame casts** (:func:`apply_column_typing`): things that change
  the data representation — ``boolean.cast_as`` (integer/string),
  ``decimal`` precision/scale clamping or ``cast_as`` double/string,
  ``json.as_text`` (complex columns serialized to JSON strings). These
  are Catalyst ``cast``/``to_json`` projections, zero UDFs.
- **DDL sizing** (:func:`string_ddl_length`): ``string.length_factor /
  min_length / max_length / use_max`` only matter where a VARCHAR(n) is
  emitted — the dialect DDL generator calls this with the observed max
  length (datatype.go:2540-2576 Apply, exact port).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference env defaults (core/env: DdlMinDecLength/DdlMaxDecLength,
# DdlMinDecScale/DdlMaxDecScale); Spark's decimal caps at 38
DDL_MIN_DEC_PRECISION = 20
DDL_MAX_DEC_PRECISION = 38
DDL_MIN_DEC_SCALE = 4

# the reference's env safety floors for UNSOURCED decimal DDL sizing
# (env.go:90-93) — used by DecimalTyping.apply_column, the exact
# DecimalColumnTyping.Apply port
REF_MIN_DEC_LENGTH = 24
REF_MAX_DEC_LENGTH = 38
REF_MIN_DEC_SCALE = 6
REF_MAX_DEC_SCALE = 24
DDL_MAX_DEC_SCALE = 24
DEFAULT_STRING_MAX = 4000  # datatype.go:2548 "some safe large max"


@dataclass
class StringTyping:
    """datatype.go:2530-2576."""
    length_factor: int = 0
    min_length: int = 0
    max_length: int = 0
    use_max: bool = False

    def apply(self, length: int, native_max: int = DEFAULT_STRING_MAX) -> int:
        maxi = native_max
        if self.max_length > 0 and self.max_length < maxi:
            maxi = self.max_length
        elif self.max_length > maxi:
            maxi = self.max_length
        if maxi == 0:
            maxi = DEFAULT_STRING_MAX
        if self.use_max:
            return maxi
        if self.length_factor > 0:
            new_len = length * self.length_factor
            if new_len > maxi:
                return maxi
            if new_len < self.min_length:
                return self.min_length
            return new_len
        if length < self.min_length:
            return self.min_length
        if self.max_length > 0 and length > maxi:
            return maxi
        return length


@dataclass
class DecimalTyping:
    """datatype.go:2579-2633 — precision/scale clamps + cast_as."""
    min_precision: int | None = None
    max_precision: int = 0
    min_scale: int | None = None
    max_scale: int = 0
    cast_as: str = ""  # "" | "double" | "string"

    def apply(self, precision: int, scale: int) -> tuple[int, int]:
        if self.min_scale is not None and scale < self.min_scale:
            scale = self.min_scale
        if self.max_scale > 0 and scale > self.max_scale:
            scale = self.max_scale
        if self.min_precision is not None and precision < self.min_precision:
            precision = self.min_precision
        if self.max_precision > 0 and precision > self.max_precision:
            precision = self.max_precision
        precision = min(precision, DDL_MAX_DEC_PRECISION)
        if precision <= scale:  # keep at least one integer digit
            precision = min(scale + 1, DDL_MAX_DEC_PRECISION)
            scale = min(scale, precision - 1)
        return precision, scale

    def apply_column(self, db_precision: int = 0, db_scale: int = 0,
                     sourced: bool = False, max_len: int = 0,
                     max_dec_len: int = 0) -> tuple[int, int]:
        """Exact port of DecimalColumnTyping.Apply
        (datatype.go:2587-2637) for DDL sizing from full column
        context: source-declared (p, s) when ``sourced``, else
        inference-stat-derived with the reference's env safety floors
        (DdlMinDecLength 24 / DdlMinDecScale 6, env.go:90-93) and the
        unsourced precision re-derivation that widens by the scale
        surplus. ``apply`` above stays the lightweight clamp used on
        already-typed DataFrame decimals."""
        min_p_stats = max_len
        precision, scale = db_precision, db_scale
        if precision == 0:
            if scale == 0:
                scale = max(scale, REF_MIN_DEC_SCALE, max_dec_len)
            precision = max(precision, scale * 2,
                            REF_MIN_DEC_LENGTH, min_p_stats)
        mn_p, mx_p = self.min_precision, self.max_precision
        mn_s, mx_s = self.min_scale, self.max_scale
        if not sourced:
            mn_s = REF_MIN_DEC_SCALE if mn_s is None else mn_s
            mx_s = mx_s or REF_MAX_DEC_SCALE
            mn_p = REF_MIN_DEC_LENGTH if mn_p is None else mn_p
            mx_p = mx_p or REF_MAX_DEC_LENGTH
            p_delta = max(precision - REF_MIN_DEC_LENGTH, 0)
            s_delta = max(scale - REF_MIN_DEC_SCALE, 0)
            # safe re-derivation: min length + surplus digits + surplus
            # scale (room for the integer part when scale is deep)
            precision = REF_MIN_DEC_LENGTH + p_delta + s_delta
        if mn_p is not None and precision < mn_p:
            precision = mn_p
        if precision < min_p_stats:
            precision = min_p_stats
        if mx_p and precision > mx_p:
            precision = mx_p
        if mn_s is not None and scale < mn_s:
            scale = mn_s
        if mx_s and scale > mx_s:
            scale = mx_s
        return precision, scale


@dataclass
class BooleanTyping:
    """datatype.go:2650-2664 — cast booleans for DBs without them."""
    cast_as: str = ""  # "" | "integer" | "string"


@dataclass
class JsonTyping:
    """datatype.go:2636-2647 — serialize complex columns to text."""
    as_text: bool = False


@dataclass
class ColumnTyping:
    string: StringTyping | None = None
    decimal: DecimalTyping | None = None
    boolean: BooleanTyping | None = None
    json: JsonTyping | None = None

    def max_decimals(self) -> int:
        """ColumnTyping.MaxDecimals port (datatype.go): the effective
        decimal-scale bound the CSV/JSON writers truncate to; -1 = no
        bound. max_scale wins over min_scale."""
        if self.decimal is None:
            return -1
        if self.decimal.max_scale > 0:
            return self.decimal.max_scale
        if self.decimal.min_scale is not None:
            return self.decimal.min_scale
        return -1

    @classmethod
    def from_dict(cls, d: dict[str, Any] | None) -> "ColumnTyping":
        d = d or {}
        return cls(
            string=StringTyping(**d["string"]) if d.get("string") else None,
            decimal=DecimalTyping(**d["decimal"]) if d.get("decimal") else None,
            boolean=BooleanTyping(**d["boolean"]) if d.get("boolean") else None,
            json=JsonTyping(**d["json"]) if d.get("json") else None,
        )


def apply_column_typing(
    df: DataFrame, ct: ColumnTyping | dict | None,
) -> DataFrame:
    """Apply the representation-changing half of the policy as Catalyst
    cast projections. String sizing is DDL-only (no-op on the data)."""
    if ct is None:
        return df
    if isinstance(ct, dict):
        ct = ColumnTyping.from_dict(ct)
    exprs = []
    changed = False
    for f in df.schema.fields:
        col = F.col(f"`{f.name}`")
        dt = f.dataType
        if isinstance(dt, T.BooleanType) and ct.boolean and ct.boolean.cast_as:
            kind = ct.boolean.cast_as.lower()
            if kind == "integer":
                col = col.cast("smallint")
            elif kind == "string":
                col = col.cast("string")
            else:
                raise ValueError(f"boolean.cast_as: {kind!r}")
            changed = True
        elif isinstance(dt, T.DecimalType) and ct.decimal:
            if ct.decimal.cast_as:
                # the reference's "float" GENERAL type is a float64
                # (postgres double precision) — Spark's bare "float"
                # is 32-bit and would corrupt DECIMAL(6,5) values
                # (r.70: 1.23450 -> 1.2345000505…)
                tgt = {"float": "double"}.get(
                    ct.decimal.cast_as.lower(), ct.decimal.cast_as)
                col = col.cast(tgt)
                changed = True
            else:
                p, s = ct.decimal.apply(dt.precision, dt.scale)
                if (p, s) != (dt.precision, dt.scale):
                    col = col.cast(T.DecimalType(p, s))
                    changed = True
        elif isinstance(dt, (T.StructType, T.ArrayType, T.MapType)) \
                and ct.json and ct.json.as_text:
            col = F.to_json(col)
            changed = True
        exprs.append(col.alias(f.name))
    return df.select(*exprs) if changed else df


def string_ddl_length(
    ct: ColumnTyping | dict | None, observed_len: int | None,
    native_max: int = DEFAULT_STRING_MAX, default_len: int = 255,
) -> int:
    """VARCHAR sizing for DDL generation: observed max length through the
    string policy (falls back to a default width when no stats)."""
    if isinstance(ct, dict):
        ct = ColumnTyping.from_dict(ct)
    st = (ct.string if ct else None) or StringTyping()
    return st.apply(observed_len if observed_len is not None else default_len,
                    native_max)
