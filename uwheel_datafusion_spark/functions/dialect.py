"""Dual-dialect SQL expression builders.

The training-data operators (dedup, text analysis, similarity) are
correctness-gated against a DuckDB oracle, so every expression must
evaluate **identically** in Spark SQL and DuckDB. This module is the
single source of truth: each builder emits the same logical expression
in either dialect, so the Spark implementation and the oracle cannot
drift apart.

Portability rules baked in (verified empirically on pyspark 4.1 /
duckdb 1.0):

- ``md5`` of a string yields the same lowercase hex in both (Spark
  needs a binary cast);
- ``split``/``string_split`` keep empty tokens and agree on '' → [''];
- list lambdas: transform/filter/reduce all exist in both (DuckDB's
  ``list_reduce`` has no zero element — emulated via ``list_prepend``);
- integer arithmetic, ``>>``, ``&``, ``bit_count`` agree; XOR is ``^``
  in Spark but ``xor()`` in DuckDB (``^`` is POWER there!);
- float math is only used via double-cast single IEEE ops.

All derived hashes/scores are pure integer math on top of md5 nibbles,
so results are deterministic and engine-independent.
"""

from __future__ import annotations

from dataclasses import dataclass

@dataclass(frozen=True)
class Dialect:
    name: str

    # ---- naming differences -------------------------------------------------
    @property
    def is_spark(self) -> bool:
        return self.name == "spark"

    def md5(self, e: str) -> str:
        return f"md5(CAST({e} AS BINARY))" if self.is_spark else f"md5({e})"

    def split(self, e: str, sep: str = " ") -> str:
        fn = "split" if self.is_spark else "string_split"
        return f"{fn}({e}, '{sep}')"

    def size(self, arr: str) -> str:
        return f"{'size' if self.is_spark else 'len'}({arr})"

    def idx(self, arr: str, i: str) -> str:
        """1-based list element access."""
        return (
            f"element_at({arr}, {i})" if self.is_spark else f"list_extract({arr}, {i})"
        )

    def transform(self, arr: str, var: str, body: str) -> str:
        fn = "transform" if self.is_spark else "list_transform"
        return f"{fn}({arr}, {var} -> {body})"

    def filter(self, arr: str, var: str, body: str) -> str:
        fn = "filter" if self.is_spark else "list_filter"
        return f"{fn}({arr}, {var} -> {body})"

    def array_distinct(self, arr: str) -> str:
        fn = "array_distinct" if self.is_spark else "list_distinct"
        return f"{fn}({arr})"

    def array_min(self, arr: str) -> str:
        fn = "array_min" if self.is_spark else "list_min"
        return f"{fn}({arr})"

    def array_max(self, arr: str) -> str:
        fn = "array_max" if self.is_spark else "list_max"
        return f"{fn}({arr})"

    def seq1(self, n: str) -> str:
        """[1..n] as a list; empty when n < 1 (Spark's sequence() would
        count DOWN for n<1, so it is sliced defensively)."""
        if self.is_spark:
            return f"slice(sequence(1, greatest({n}, 1)), 1, greatest({n}, 0))"
        return f"generate_series(1, {n})"

    def reduce(self, arr: str, zero: str, a: str, b: str, body: str) -> str:
        """Left fold with explicit zero element."""
        if self.is_spark:
            return f"aggregate({arr}, CAST({zero} AS BIGINT), ({a}, {b}) -> {body})"
        return (
            f"list_reduce(list_prepend(CAST({zero} AS BIGINT), {arr}),"
            f" ({a}, {b}) -> {body})"
        )

    def xor(self, a: str, b: str) -> str:
        return f"({a} ^ {b})" if self.is_spark else f"xor({a}, {b})"

    def regexp_tokens(self, e: str, pattern: str) -> str:
        """All non-overlapping matches of ``pattern`` as a list. The
        pattern must keep alternatives start-disjoint so Java regex
        (leftmost-first) and RE2 (DuckDB) agree; Spark string literals
        process backslash escapes, so backslashes are doubled there."""
        if self.is_spark:
            return f"regexp_extract_all({e}, '{pattern.replace(chr(92), chr(92) * 2)}', 0)"
        return f"regexp_extract_all({e}, '{pattern}')"

    def sum_list_bigint(self, arr: str) -> str:
        """Sum a bigint list → bigint (DuckDB's list_sum widens to
        HUGEINT, so cast back)."""
        if self.is_spark:
            return self.reduce(arr, "0", "a", "b", "a + b")
        return f"CAST(list_sum({arr}) AS BIGINT)"

    def idiv(self, a: str, b: str) -> str:
        """Integer floor division: Spark `div`, DuckDB `//`."""
        if self.is_spark:
            return f"(({a}) div ({b}))"
        return f"(({a}) // ({b}))"

    def slice(self, arr: str, start: str, length: int) -> str:
        """1-based sublist of ``length`` elements (shorter at the end).
        Spark's slice(a, s, L) ≡ DuckDB's inclusive list_slice(a, s,
        s+L-1)."""
        if self.is_spark:
            return f"slice({arr}, {start}, {length})"
        return f"list_slice({arr}, {start}, ({start}) + {length - 1})"

    def array_join(self, arr: str, sep: str = " ") -> str:
        fn = "array_join" if self.is_spark else "array_to_string"
        return f"{fn}({arr}, '{sep}')"

    def zip_mult(self, a: str, b: str) -> str:
        """Element-wise product of two bigint lists."""
        if self.is_spark:
            return f"zip_with({a}, {b}, (x, y) -> x * y)"
        return f"list_transform(list_zip({a}, {b}), z -> z[1] * z[2])"

    def zip_sub(self, a: str, b: str) -> str:
        """Element-wise difference of two bigint lists (residual
        vectors for IVF-PQ residual encoding)."""
        if self.is_spark:
            return f"zip_with({a}, {b}, (x, y) -> x - y)"
        return f"list_transform(list_zip({a}, {b}), z -> z[1] - z[2])"

    def zip_sqdiff(self, a: str, b: str) -> str:
        """Element-wise squared difference of two bigint lists (the
        summand of an exact integer squared-L2 distance)."""
        if self.is_spark:
            return f"zip_with({a}, {b}, (x, y) -> (x - y) * (x - y))"
        return (
            f"list_transform(list_zip({a}, {b}), "
            f"z -> (z[1] - z[2]) * (z[1] - z[2]))"
        )

    # ---- shared building blocks --------------------------------------------

    def hash32(self, e: str) -> str:
        """Portable 32-bit token hash: first 8 md5 hex chars parsed as
        an int. Uniform, deterministic, identical across engines (and
        bit-identical to the former per-nibble weighted sum — a hex
        parse IS that sum, at 1 expression instead of 8×(instr +
        substring))."""
        return self.hash32_of_hex(self.md5(e))

    def hash32_of_hex(self, h: str) -> str:
        """hash32 when the md5 hex string is already materialized."""
        if self.is_spark:
            return f"CAST(conv(substring({h}, 1, 8), 16, 10) AS BIGINT)"
        return f"CAST(('0x' || substr({h}, 1, 8)) AS BIGINT)"

    def token_hashes(self, tokens: str) -> str:
        """list<string> tokens → list<bigint> 32-bit hashes (md5
        materialized once per token)."""
        md5s = self.transform(tokens, "t", self.md5("t"))
        return self.transform(md5s, "h", self.hash32_of_hex("h"))

    def hash60_of_hex(self, h: str) -> str:
        """60-bit hash from a materialized md5 hex string: first 15 hex
        chars parsed as an int. 15 (not 16) chars so the value tops out
        at 2^60−1 — always inside signed-BIGINT range in BOTH engines
        (16 chars could exceed 2^63−1: Spark's conv→cast would NULL and
        DuckDB's hex cast would error on overflow, and the two disagree
        on wraparound). 60 bits pushes the birthday bound for unrelated
        n-gram collisions from ~2^16 grams (32-bit) to ~2^30 grams."""
        if self.is_spark:
            return f"CAST(conv(substring({h}, 1, 15), 16, 10) AS BIGINT)"
        return f"CAST(('0x' || substr({h}, 1, 15)) AS BIGINT)"

    def token_hashes60(self, tokens: str) -> str:
        """list<string> tokens → list<bigint> 60-bit hashes — for paths
        where a hash collision is DESTRUCTIVE (e.g. span scrubbing
        deletes text): at web-corpus gram cardinalities 32-bit hashes
        collide constantly (birthday ~2^16), 60-bit holds to ~10^9."""
        md5s = self.transform(tokens, "t", self.md5("t"))
        return self.transform(md5s, "h", self.hash60_of_hex("h"))

    def shingles(self, tokens: str, n: int = 3) -> str:
        """Word n-grams joined by spaces; empty list when < n tokens."""
        positions = self.seq1(f"{self.size(tokens)} - {n - 1}")
        parts = ", ".join(
            [self.idx(tokens, f"i + {k}") if k else self.idx(tokens, "i") for k in range(n)]
        )
        return self.transform(positions, "i", f"concat_ws(' ', {parts})")

    def stopword_hits(self, tokens: str, words: tuple[str, ...]) -> str:
        lst = ", ".join(f"'{w}'" for w in words)
        return self.size(self.filter(tokens, "t", f"t IN ({lst})"))

    def quantize_vec(self, arr: str, scale: int = 10_000) -> str:
        """array<float> → list<bigint> of round(x·scale): integer dot
        products are then exact & associative (same trick as the wheel's
        scaled-long sums)."""
        return self.transform(
            arr, "x", f"CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)"
        )

    def dot_q(self, a: str, b: str) -> str:
        """Exact integer dot product of two quantized vectors."""
        return self.sum_list_bigint(self.zip_mult(a, b))

    def bit_count(self, e: str) -> str:
        """Population count of an integer — identical builtin name in
        both engines (Spark widens to INT, DuckDB to TINYINT; callers
        cast the SUM)."""
        return f"bit_count({e})"

    def shl1(self, e: str) -> str:
        """BIGINT 1 << e (e < 63 — callers pack 32-bit words so sign
        and overflow never differ across engines)."""
        if self.is_spark:
            return f"shiftleft(CAST(1 AS BIGINT), {e})"
        return f"(CAST(1 AS BIGINT) << ({e}))"

    def sign_pack32(self, qvec: str, dim: int) -> str:
        """Quantized bigint vector → list of ⌈dim/32⌉ BIGINT words of
        SIGN BITS: bit (j−1) of word w is set iff qvec[32w+j] > 0 —
        binary quantization (1 bit per dimension, 32 dims per word;
        32-bit words inside BIGINTs so shifts and sums are identical
        in both engines with no sign-bit edge cases). Entirely builtin
        expressions: packing stays in whole-stage codegen on Spark."""
        words = []
        for w in range(0, dim, 32):
            width = min(32, dim - w)
            body = (
                f"acc + CASE WHEN {self.idx(qvec, f'j + {w}')} > 0 "
                f"THEN {self.shl1('j - 1')} ELSE CAST(0 AS BIGINT) END"
            )
            words.append(
                self.reduce(self.seq1(str(width)), "0", "acc", "j", body)
            )
        inner = ", ".join(words)
        return f"array({inner})" if self.is_spark else f"[{inner}]"

    def hamming_words(self, a: str, b: str) -> str:
        """Exact Hamming distance between two packed sign-bit word
        lists: Σ popcount(a[i] XOR b[i]) — two builtin ops per word,
        no Python, no UDF."""
        if self.is_spark:
            pc = f"zip_with({a}, {b}, (x, y) -> CAST(bit_count(x ^ y) AS BIGINT))"
        else:
            pc = (
                f"list_transform(list_zip({a}, {b}), "
                f"z -> CAST(bit_count(xor(z[1], z[2])) AS BIGINT))"
            )
        return self.sum_list_bigint(pc)

    def cosine_q(self, dot: str, na: str, nb: str) -> str:
        """cos = dot / sqrt(na·nb), all single IEEE double ops."""
        return (
            f"(CAST({dot} AS DOUBLE) / sqrt(CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE)))"
        )


SPARK = Dialect("spark")
DUCK = Dialect("duck")
