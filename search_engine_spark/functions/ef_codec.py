"""Elias-Fano doc-id stream codec — the quasi-succinct posting layout
(Vigna, "Quasi-succinct indices", WSDM 2013; Elias 1974 / Fano 1971).

Alternative to the delta-gap varbyte codec (functions/codec.py) for
the doc-id stream of an index block: a strictly-ascending sequence of
n doc-ids over universe u is split per value into

    l = max(0, floor(log2(u / n)))    low bits, bit-packed verbatim
    high = value >> l                 unary-coded as a bitmap with
                                      bit (high[i] + i) set

for a worst-case 2 + ceil(log2(u/n)) bits per doc-id — INDEPENDENT of
the gap distribution. Varbyte pays >= 8 bits per posting; Elias-Fano
beats it whenever average gaps are below ~2^6, i.e. exactly the dense
stopword/hot-term lists that dominate index bytes at corpus scale.
The tf stream stays varbyte (tfs are small and not monotone).

Block layout (one index block per row, <= POSTING_BLOCK postings):

    varbyte[n, u, l, n_high_bytes] + high bitmap + packed low bits
    + varbyte(tfs)*n

Everything is numpy-vectorized: low bits via one (n, l) bit matrix +
packbits; the high bitmap via one scatter + packbits; decode via
flatnonzero on the unpacked bitmap. No per-value Python loops.

Reference analogue: the reference persists postings as plain text
(/root/reference/src/invertedIndex.py:703-729); this is the second
compressed persistence the rebuild offers beyond it, value-gated for
losslessness through BM25 ranking exactly like the varbyte path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from .codec import varbyte_decode, varbyte_encode

# --- pure numpy codec -------------------------------------------------


def ef_encode(doc_ids: np.ndarray) -> bytes:
    """Strictly-ascending uint64 doc-ids → Elias-Fano bytes."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    n = int(d.size)
    if n == 0:
        return varbyte_encode(np.zeros(1, dtype=np.uint64)).tobytes()
    u = int(d[-1]) + 1
    l = max(0, int(np.floor(np.log2(u / n))))
    # high bitmap: bit (value >> l) + i set for the i-th value
    high = (d >> np.uint64(l)).astype(np.int64)
    nbits_high = int(high[-1]) + n
    hbits = np.zeros(nbits_high, dtype=np.uint8)
    hbits[high + np.arange(n, dtype=np.int64)] = 1
    hbytes = np.packbits(hbits)
    # low bits: (n, l) bit matrix, MSB-first per value, bit-packed
    if l > 0:
        low = d & np.uint64((1 << l) - 1)
        shifts = np.arange(l - 1, -1, -1, dtype=np.uint64)
        lbits = ((low[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
        lbytes = np.packbits(lbits.ravel())
    else:
        lbytes = np.empty(0, dtype=np.uint8)
    header = varbyte_encode(np.array([n, u, l, hbytes.size], dtype=np.uint64))
    return header.tobytes() + hbytes.tobytes() + lbytes.tobytes()


def ef_decode(buf: bytes) -> np.ndarray:
    """Inverse of ef_encode → int64 doc-id array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    # header = 4 varbyte values; find its byte length from final-byte flags
    finals = np.flatnonzero((b & 0x80) == 0)
    if b.size and int(varbyte_decode(b[:finals[0] + 1])[0]) == 0:
        return np.empty(0, dtype=np.int64)
    hdr_end = int(finals[3]) + 1
    n, u, l, n_hbytes = (int(x) for x in varbyte_decode(b[:hdr_end]))
    hbytes = b[hdr_end:hdr_end + n_hbytes]
    hbits = np.unpackbits(hbytes)
    pos = np.flatnonzero(hbits)[:n].astype(np.int64)
    high = pos - np.arange(n, dtype=np.int64)
    if l > 0:
        lbytes = b[hdr_end + n_hbytes:]
        lbits = np.unpackbits(lbytes)[:n * l].reshape(n, l).astype(np.int64)
        weights = (1 << np.arange(l - 1, -1, -1, dtype=np.int64))
        low = lbits @ weights
    else:
        low = np.zeros(n, dtype=np.int64)
    return (high << l) | low


def ef_encode_block(doc_ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """One posting block → EF doc-ids + varbyte tfs."""
    ef = ef_encode(np.asarray(doc_ids, dtype=np.uint64))
    return ef + varbyte_encode(np.asarray(tfs, dtype=np.uint64)).tobytes()


def ef_decode_block(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """bytes → (doc_ids int64, tfs int64)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    finals = np.flatnonzero((b & 0x80) == 0)
    hdr_end = int(finals[0]) + 1
    n = int(varbyte_decode(b[:hdr_end])[0])
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    hdr_end = int(finals[3]) + 1
    _n, _u, l, n_hbytes = (int(x) for x in varbyte_decode(b[:hdr_end]))
    n_lbytes = (n * l + 7) // 8
    ef_end = hdr_end + n_hbytes + n_lbytes
    ids = ef_decode(bytes(b[:ef_end]))
    tfs = varbyte_decode(b[ef_end:])[:n].astype(np.int64)
    return ids, tfs


# --- Spark surface ----------------------------------------------------

@pandas_udf(T.BinaryType())
def encode_postings_ef_udf(doc_ids: pd.Series, tfs: pd.Series) -> pd.Series:
    """array<long>, array<long> → binary (per index-block row)."""
    return pd.Series([
        ef_encode_block(np.asarray(d, dtype=np.uint64),
                        np.asarray(t, dtype=np.uint64))
        for d, t in zip(doc_ids, tfs)])


_EF_DECODED = T.StructType([
    T.StructField("doc_ids", T.ArrayType(T.LongType()), False),
    T.StructField("tfs", T.ArrayType(T.LongType()), False),
])


@pandas_udf(_EF_DECODED)
def decode_postings_ef_udf(enc: pd.Series) -> pd.DataFrame:
    """binary → struct<doc_ids, tfs array<long>>."""
    ids, tfs = [], []
    for buf in enc:
        d, t = ef_decode_block(bytes(buf))
        ids.append(d.tolist())
        tfs.append(t.tolist())
    return pd.DataFrame({"doc_ids": ids, "tfs": tfs})


def encode_index_ef(blocked: DataFrame) -> DataFrame:
    """Blocked index (postings array<struct<doc_id,tf>>) → Elias-Fano
    layout with `postings_ef binary`. Term/block metadata columns stay
    plain (they are the skip index — readable without decoding)."""
    d = F.transform("postings", lambda p: p["doc_id"])
    t = F.transform("postings", lambda p: p["tf"])
    cols = [c for c in blocked.columns if c != "postings"]
    return blocked.select(
        *cols,
        F.size("postings").alias("n_postings"),
        encode_postings_ef_udf(d, t).alias("postings_ef"))


def decoded_postings_long_ef(enc: DataFrame) -> DataFrame:
    """EF index rows → exploded (term, ..., doc_id, tf) relation.
    Decode happens AFTER any term/block pruning, mirroring
    codec.decoded_postings_long."""
    dec = enc.withColumn("_dec", decode_postings_ef_udf("postings_ef"))
    meta = [c for c in enc.columns if c not in ("postings_ef", "n_postings")]
    return (dec.select(*meta, F.explode(F.arrays_zip(
                F.col("_dec.doc_ids").alias("doc_id"),
                F.col("_dec.tfs").alias("tf"))).alias("p"))
            .select(*meta, F.col("p.doc_id").alias("doc_id"),
                    F.col("p.tf").cast("int").alias("tf")))
