"""Local replica of the driver's Spark-vs-DuckDB comparison.

Row count + column-name set + order-insensitive value comparison
(columns sorted by name, rows sorted by all columns). Floats compare
with a 1e-9 absolute tolerance — queries already round to 6 decimals
so this only absorbs representation noise, not semantic drift.
"""

from __future__ import annotations

import decimal

import numpy as np
import pandas as pd


def _is_decimal_object(col: pd.Series) -> bool:
    """True when an object-dtype column actually carries decimal.Decimal
    values (live DecimalType leaking through toPandas)."""
    if not pd.api.types.is_object_dtype(col):
        return False
    non_null = col.dropna()
    return len(non_null) > 0 and all(
        isinstance(v, decimal.Decimal) for v in non_null.head(16)
    )


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    # Sort on 6dp-rounded float keys: queries already round float
    # outputs to 6 decimals, so representation noise (<1e-9) rounds
    # identically on both sides and cannot misalign rows the way
    # sorting on raw doubles could (values just under the compare
    # tolerance sorting differently in each frame).
    sort_frame = df.copy()
    for c in sort_frame.columns:
        if pd.api.types.is_float_dtype(sort_frame[c]):
            sort_frame[c] = sort_frame[c].round(6)
    order = sort_frame.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (oracle)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    # Decimal-vs-numeric divergence check BEFORE _canonical, which
    # stringifies object columns and would let the float branch parse
    # them back — exactly how the s46 Decimal price_sum passed locally
    # while the driver (which hashes the raw pandas values: Decimal
    # objects vs float64) flagged hash_match FALSE in r14. Mirrors the
    # int-vs-float strict-dtype rule below.
    for c in sorted(spark_pdf.columns):
        sv_raw, dv_raw = spark_pdf[c], duck_pdf[c]
        s_dec, d_dec = _is_decimal_object(sv_raw), _is_decimal_object(dv_raw)
        s_num = pd.api.types.is_numeric_dtype(sv_raw)
        d_num = pd.api.types.is_numeric_dtype(dv_raw)
        if (s_dec and d_num) or (d_dec and s_num):
            side = "spark" if s_dec else "oracle"
            raise AssertionError(
                f"{name}: column {c!r} is object-dtype decimal.Decimal on the "
                f"{side} side but numeric ({(dv_raw if s_dec else sv_raw).dtype}) "
                f"on the other — the driver hashes raw values, so this is a "
                f"driver hash FAIL. Cast the decimal aggregate back to the "
                f"wire format: r6(F.sum(...).cast('double')) / "
                f"ROUND(CAST(SUM(...) AS DOUBLE), 6) (q1_decimal house "
                f"pattern, operators/tpch.py)"
            )
    s, d = _canonical(spark_pdf), _canonical(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        # Strict dtype parity: the driver hashes the raw pandas values,
        # so int64-vs-float64 is a hash mismatch even when the numbers
        # are equal (DuckDB widens uncast integer SUMs to HUGEINT →
        # float64 via fetchdf). Mirror that here instead of silently
        # promoting to a tolerant float compare.
        si, di = pd.api.types.is_integer_dtype(sv), pd.api.types.is_integer_dtype(dv)
        sf, df_ = pd.api.types.is_float_dtype(sv), pd.api.types.is_float_dtype(dv)
        if (si and df_) or (sf and di):
            raise AssertionError(
                f"{name}: column {c!r} dtype mismatch: spark={sv.dtype} "
                f"oracle={dv.dtype} — cast the oracle aggregate "
                f"(e.g. CAST(SUM(...) AS BIGINT)) so both sides agree"
            )
        if sf or df_:
            sa = sv.astype("float64").to_numpy()
            da = dv.astype("float64").to_numpy()
            ok = np.isclose(sa, da, rtol=0.0, atol=1e-9, equal_nan=True)
            # Driver-faithful signed-zero check: the driver hashes raw
            # bytes, so Spark 0.0 vs oracle -0.0 is a driver FAIL even
            # though isclose (and ==) call them equal. Flag any zero
            # whose sign bit differs between the two sides so this bug
            # class can never again be local-green/driver-red (a19, r4-r5).
            zdiv = (sa == 0.0) & (da == 0.0) & (np.signbit(sa) != np.signbit(da))
            if zdiv.any():
                bad = int(np.argmax(zdiv))
                raise AssertionError(
                    f"{name}: column {c!r} signed-zero divergence at sorted "
                    f"row {bad}: spark={sv.iloc[bad]!r} oracle={dv.iloc[bad]!r} "
                    f"— wrap both sides' rounding in zround/`ROUND(...) + 0.0` "
                    f"({int(zdiv.sum())} rows affected)"
                )
        else:
            ok = (sv.to_numpy() == dv.to_numpy()) | (sv.isna() & dv.isna()).to_numpy()
        if not ok.all():
            bad = int(np.argmin(ok))
            raise AssertionError(
                f"{name}: column {c!r} mismatch at sorted row {bad}: "
                f"spark={sv.iloc[bad]!r} oracle={dv.iloc[bad]!r} "
                f"({int((~ok).sum())} of {len(ok)} rows differ)"
            )
