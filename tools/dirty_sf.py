#!/usr/bin/env python
"""Build an adversarially-dirty copy of a test scale factor.

Real 100 TB corpora are dirty: failed fetches (NULL text), empty and
whitespace-only documents, boilerplate single-token docs, exact duplicates,
failed encoder calls (NULL embeddings), zero-norm vectors, NULL labels.
The fixed driver testdata contains none of these, so an oracle pair can
agree "by data luck" while its semantics silently diverge on the dirty
rows (the round-3 ADVICE found exactly one such case — a single-active-day
user class absent from sf0.01).

This tool copies a base SF directory and appends dirty rows to every
table with pyarrow, preserving the original parquet schemas
byte-for-byte (``events`` keeps its TIMESTAMP(NANOS) type). The dirt
catalog per table family:

- documents/embeddings: NULL/empty/whitespace text, boilerplate, exact
  dupes, NULL embeddings, zero-norm vectors, NULL labels; round 6 adds
  unicode case-mapping bait (Turkish İ, Greek final sigma, German ß —
  all verified engine-divergent under full Unicode lower/upper),
  NBSP/ZWSP invisibles, emoji/CJK, and combining-vs-precomposed pairs.
- events: anonymous (NULL user), untyped, valueless, NaN-valued,
  clock-less (NULL ts), malformed JSON, JSON null literal; round 6 adds
  extreme timestamps (1905, pre-epoch 1969, epoch zero) — negative-epoch
  arithmetic, exactly-at-gap session boundaries, and grid explosion.
- orders/lineitem: FK holes AND dangling FKs, NULL dates, NULL/NaN/±Inf
  amounts, negative quantities (returns), discount > 1, NULL group keys.
- customer/supplier/part/nation/region: NULL names/labels/keys,
  NaN/±Inf balances and prices, unicode names, empty-string vs NULL,
  dangling dimension FKs, a NULL-named region reachable through a real
  nation join. (The ±Inf class covers every measure-bearing table:
  lineitem, orders, events, customer, supplier, part — round-5 advice
  predicted the part gap and the oracle there is isfinite-hardened.)

Round 7b extends the catalog with: NUL/control bytes inside tokens, a
50k-char single-token document, empty-string lang, an exactly-replayed
event row, a reused event_id across time, degenerate JSON props
(''/'   '/'null'/'[]'/'123'/'{}'), proleptic-calendar-extreme dates
(year 9999 / year 1) on orders and lineitem, an IEEE -0.0 embedding
component, lying/negative n_chars, a constant zero-variance embedding,
a duplicated c_custkey, the smallest subnormal double, a CONFLICTING
duplicate at the same (ts, event_id), and int64-EDGE keys (+/-2^63) on
every bigint key column — the probe behind five ANSI overflow/cast
job-killers, the from_xml int64-min parse hole, and a NaN-vs-median
rank-parity divergence.

Round 8 adds: a DST/leap class (events at the Europe/Amsterdam 2024
spring-forward and fall-back instants with ±1µs neighbors, leap-day end,
and a leap-second-adjacent midnight — the engine pins UTC, so these must
be no-divergence), and a NULL-PRIMARY-key class on every table (NULL
c_custkey/s_suppkey/p_partkey/n_nationkey/r_regionkey/l_orderkey/
doc_id/vec_id/event_id): equi-joins drop NULL keys on both engines,
groupers keep one NULL group, and sort/tie-break contracts must agree
on NULL placement. ``build_skewed`` (also round 8) is the companion
KEY-DISTRIBUTION stressor: one hot key absorbing ~50% of events/orders/
lineitems, swept by tests/test_skew_parity.py.

Because the sweep compares Spark and DuckDB on the SAME dirty data, any
injected weirdness is fair game: a divergence always means a real
cross-engine semantics gap (or a query relying on an undocumented data
contract), never "bad data".

Usage:
    python tools/dirty_sf.py [base_sf_dir] [out_dir]
    SPARK_GRAFT_ORACLE_SF=<out_dir> python tools/check_window.py 233

Every query/oracle pair that disagrees on the dirty copy is a latent
cross-engine divergence — a bug in the Spark query, the oracle, or an
undocumented data assumption — found BEFORE a scale-up does.
"""

from __future__ import annotations

import os
import shutil
import sys
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# id range far above any real SF's ids so injected rows never collide
BASE_ID = 10_000_000


def dirty_documents(tbl: pa.Table) -> pa.Table:
    first_text = tbl.column("text")[0].as_py()
    rows = [
        # failed fetch: everything NULL but the id
        {"doc_id": BASE_ID + 0, "text": None, "lang": None,
         "source": None, "n_chars": None},
        # empty text
        {"doc_id": BASE_ID + 1, "text": "", "lang": "en",
         "source": "src0", "n_chars": 0},
        # whitespace-only text
        {"doc_id": BASE_ID + 2, "text": "   ", "lang": None,
         "source": "src0", "n_chars": 3},
        # pathological repetition, NULL source
        {"doc_id": BASE_ID + 3, "text": "dup dup dup dup dup dup dup dup",
         "lang": "en", "source": None, "n_chars": 31},
        # exact duplicate of an existing document (different id)
        {"doc_id": BASE_ID + 4, "text": first_text, "lang": "es",
         "source": "src0", "n_chars": len(first_text)},
        # single token, unseen lang/source values
        {"doc_id": BASE_ID + 5, "text": "x", "lang": "zz",
         "source": "srcX", "n_chars": 1},
        # --- unicode case-mapping divergence bait (round 6). Verified
        # engine gap: Spark (Java, Locale.ROOT) lower('İ') = 'i̇' (i +
        # combining dot, 2 codepoints) vs DuckDB (utf8proc) 'i';
        # lower('ΑΣ') = 'ας' (context-sensitive final sigma) vs 'ασ';
        # upper('ß') = 'SS' vs 'ẞ'. Any query that emits case-mapped
        # non-ASCII tokens in compared output diverges on these rows.
        {"doc_id": BASE_ID + 6, "text": "İstanbul İİ DORUĞU",
         "lang": "tr", "source": "src0", "n_chars": 18},
        {"doc_id": BASE_ID + 7, "text": "ΔΙΑΣ ΟΔΥΣΣΕΥΣ ΑΣ",
         "lang": "el", "source": "src0", "n_chars": 16},
        {"doc_id": BASE_ID + 8, "text": "STRAßE straße ß",
         "lang": "de", "source": "src0", "n_chars": 15},
        # unicode whitespace/invisibles: NBSP (U+00A0) and ZWSP (U+200B)
        # are NOT \s in Java or RE2 regexes — they stay inside tokens on
        # both engines; emoji/CJK exercise codepoint-length parity
        {"doc_id": BASE_ID + 9,
         "text": "nb\u00a0sp zw\u200bsp \U0001f600\U0001f600 你好 世界",
         "lang": "zh", "source": "srcX", "n_chars": 18},
        # combining-diacritic vs precomposed café: byte-distinct,
        # visually equal — must stay two distinct tokens/groups on
        # both engines
        {"doc_id": BASE_ID + 10, "text": "caf\u00e9 cafe\u0301 cafe",
         "lang": "fr", "source": "srcX", "n_chars": 15},
        # --- astral-plane class (round 7): 4-byte UTF-8 (surrogate PAIRS
        # in UTF-16 runtimes). Java String.length counts them as 2 while
        # Python len and DuckDB count codepoints \u2014 any length/substring/
        # chunk-boundary arithmetic that leaks UTF-16 units diverges.
        # Mixed-with-ASCII and astral-only rows; n_chars = codepoints.
        {"doc_id": BASE_ID + 11,
         "text": "\U0001D11E clef \U0001F600 grin "
                 "\U0001D518\U0001D52B\U0001D526 frak",
         "lang": "en", "source": "srcX", "n_chars": 22},
        {"doc_id": BASE_ID + 12,
         "text": "\U0001F701\U0001F702\U0001F703\U0001F704",
         "lang": None, "source": "srcX", "n_chars": 4},
        # tab/newline/CR separators (round 7): the ASCII \\s class
        # ([ \\t\\n\\r\\f\\v]) must tokenize identically in Java regex,
        # RE2, Python re.ASCII and DuckDB — pins the tokenizer parity
        # the NBSP row pins for the NON-members of the class.
        {"doc_id": BASE_ID + 13,
         "text": "alpha\tbeta\ngamma\r\ndelta  epsilon\tzeta",
         "lang": "en", "source": "src1", "n_chars": 37},
        # --- regex-bait class (round 7b3, pinned no-divergence): PII
        # lookalikes and regex metacharacters that stress the Java∩RE2
        # pattern policy — out-of-range/5-octet/zero-padded IPv4, email
        # boundary cases (minimal TLD, double @, plus-addressing,
        # trailing dot), overlong phone digit runs, Arabic-Indic digits
        # (Java [0-9] and RE2 must both refuse them), literal
        # metacharacters, and $1/\\1 replacement-position bait. Probed
        # green on the full registry before landing.
        {"doc_id": BASE_ID + 20,
         "text": "ip bait 999.999.999.999 and 10.1.2.3.4 and "
                 "010.020.003.004 end",
         "lang": "en", "source": "srcR", "n_chars": 62},
        {"doc_id": BASE_ID + 21,
         "text": "a@b.co user@@ex.org x+y@sub.domain.museum dot.@ex.org "
                 "A@B.CO",
         "lang": "en", "source": "srcR", "n_chars": 60},
        {"doc_id": BASE_ID + 22,
         "text": "+31-20-55123456789012345678 call31-20-551234 "
                 "x+31-20-55abc",
         "lang": "en", "source": "srcR", "n_chars": 58},
        {"doc_id": BASE_ID + 23,
         "text": "unicode ١٢٣.٤.٥.٦ digits "
                 "user.١٢@ex.org",
         "lang": "en", "source": "srcR", "n_chars": 39},
        {"doc_id": BASE_ID + 24,
         "text": "meta (a|b)* [c-d]+ {2,3} \\d+ ^$ . ? end",
         "lang": "en", "source": "srcR", "n_chars": 39},
        {"doc_id": BASE_ID + 25, "text": "repl $1 $0 \\1 \\\\ end",
         "lang": "en", "source": "srcR", "n_chars": 20},
        {"doc_id": BASE_ID + 26, "text": "s@e.co", "lang": "en",
         "source": "srcR", "n_chars": 6},
        # DUPLICATE doc_id with DIFFERENT text (round 7, duplicate-key
        # class on documents): a re-crawled URL under the same id. Hash
        # dedup keys on content (unaffected); per-doc_id groupers merge
        # the two texts — identically on both engines or not at all.
        {"doc_id": BASE_ID + 3,
         "text": "re-crawled replacement text for a reused id",
         "lang": "en", "source": "src1", "n_chars": 43},
        # --- NUL/control-byte class (round 7b): \x00 and \x07 are valid
        # UTF-8 codepoints and NOT members of the ASCII \s class — they
        # must ride INSIDE tokens untouched on both engines (binary-safe
        # strings; a C-string engine would truncate at the NUL).
        {"doc_id": BASE_ID + 14, "text": "nul\x00byte bell\x07ring end",
         "lang": "en", "source": "src1", "n_chars": 22},
        # single enormous token (50k chars, round 7b): one token longer
        # than any chunk/byte budget — chunkers, shingle windows and
        # token-length stats must stay linear and boundary-exact; the
        # maximal-repetition text is also passage-dup/winnowing bait
        # (every shingle identical -> a 1-element distinct set).
        {"doc_id": BASE_ID + 15, "text": "a" * 50_000, "lang": "en",
         "source": "src1", "n_chars": 50_000},
        # empty-string lang (round 7b): distinct from NULL lang in every
        # per-language group/mixture/funnel ('' is a language code
        # present-but-empty; NULL is unknown)
        {"doc_id": BASE_ID + 16, "text": "plain english filler text",
         "lang": "", "source": "src1", "n_chars": 25},
        # int64-EDGE keys (round 7b3): ids at +/-2^63 edges. Any key
        # arithmetic (id + offset, -id tie-breaks, sum-of-ids checksums,
        # lpad'd label codecs) must survive them — the probe found five
        # job-killing ANSI overflows/casts and one engine parse-domain
        # hole (from_xml rejects int64-min).
        {"doc_id": 2**63 - 1, "text": "edge doc max", "lang": "en",
         "source": "src1", "n_chars": 12},
        {"doc_id": -(2**63), "text": "edge doc min", "lang": "en",
         "source": "src1", "n_chars": 12},
        # LYING metadata (round 7b2): n_chars wildly wrong (999999 for a
        # 10-char text) and NEGATIVE — the query and its oracle must
        # agree on WHICH source of truth they read (declared n_chars or
        # computed length); a pair where one side shortcuts via the
        # metadata while the other recomputes diverges here.
        {"doc_id": BASE_ID + 17, "text": "ten chars!", "lang": "en",
         "source": "src1", "n_chars": 999_999},
        {"doc_id": BASE_ID + 18, "text": "negative meta", "lang": "en",
         "source": "src1", "n_chars": -5},
        # NULL PRIMARY key (round 8): an id-less document with real text.
        # Content-keyed dedup scores it; id-keyed joins drop it; per-id
        # groupers/window partitions carry ONE NULL group — and Spark's
        # array_sort vs DuckDB's list_sort must agree on where a NULL id
        # sorts inside any pair-enumeration struct array.
        {"doc_id": None, "text": "null key document body text",
         "lang": "en", "source": "src1", "n_chars": 27},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_events(tbl: pa.Table) -> pa.Table:
    first = tbl.slice(0, 1).to_pylist()[0]
    ts0 = first["ts"]
    rows = [
        # logged-out / anonymous event: no user id
        {"event_id": BASE_ID + 0, "ts": ts0, "user_id": None,
         "event_type": "click", "value": 1.0, "props": '{"k": 1}'},
        # untyped event
        {"event_id": BASE_ID + 1, "ts": ts0, "user_id": 13,
         "event_type": None, "value": 2.0, "props": '{"k": 2}'},
        # valueless event
        {"event_id": BASE_ID + 2, "ts": ts0, "user_id": 13,
         "event_type": "click", "value": None, "props": None},
        # malformed JSON payload
        {"event_id": BASE_ID + 3, "ts": ts0, "user_id": 12,
         "event_type": "click", "value": 3.0, "props": '{bad json'},
        # clock-less event (NULL timestamp)
        {"event_id": BASE_ID + 4, "ts": None, "user_id": 12,
         "event_type": "click", "value": 4.0, "props": '{"k": 4}'},
        # NaN value (NaN grouping/ordering differs across engines more
        # often than NULL does)
        {"event_id": BASE_ID + 5, "ts": ts0, "user_id": 12,
         "event_type": "view", "value": NAN, "props": '{"k": 5}'},
        # valid JSON whose k is an explicit null literal
        {"event_id": BASE_ID + 6, "ts": ts0, "user_id": 12,
         "event_type": "view", "value": 6.0, "props": '{"k": null}'},
        # infinite value (a sensor overflow: decimal casts NULL it only
        # in Spark; double sums carry it through on both engines)
        {"event_id": BASE_ID + 7, "ts": ts0, "user_id": 12,
         "event_type": "view", "value": INF, "props": None},
        # --- extreme-timestamp class (round 6): negative-epoch and
        # epoch-zero rows. Truncating integer division (Spark `div`,
        # DuckDB `//`) vs floor(epoch/N) differ on negative epochs, and
        # window()/date_trunc must keep floor semantics there; a clock-
        # skewed or mis-parsed source WILL ship pre-1970 rows at 100 TB.
        # All values are microsecond-aligned (nanos-representable, and
        # the engine truncates event ts to micros — a documented
        # contract, io.py).
        {"event_id": BASE_ID + 8, "ts": datetime(1969, 12, 31, 23, 30),
         "user_id": 13, "event_type": "click", "value": 1.5,
         "props": None},
        {"event_id": BASE_ID + 9, "ts": datetime(1970, 1, 1),
         "user_id": 13, "event_type": "view", "value": 2.5,
         "props": '{"k": 0}'},
        # deep past (1905): year/week extraction, multi-decade gap
        # arithmetic (~3.7e9 seconds still fits bigint comfortably)
        {"event_id": BASE_ID + 10, "ts": datetime(1905, 6, 30, 12, 0, 1),
         "user_id": 13, "event_type": "click", "value": 3.5,
         "props": None},
        # IDENTICAL timestamps, distinct ids/types: every window order in
        # the repo must be total — (ts) alone would leave lag/lead/
        # row_number tie order engine-defined; (ts, event_id) pins it
        {"event_id": BASE_ID + 11, "ts": ts0, "user_id": 14,
         "event_type": "view", "value": 1.0, "props": None},
        {"event_id": BASE_ID + 12, "ts": ts0, "user_id": 14,
         "event_type": "purchase", "value": 2.0, "props": None},
        {"event_id": BASE_ID + 13, "ts": ts0, "user_id": 14,
         "event_type": "click", "value": 3.0, "props": None},
        # empty-string event_type: distinct from NULL in grouping,
        # sessions, pivots ('' is a type; NULL is 'untyped')
        {"event_id": BASE_ID + 14, "ts": ts0, "user_id": 14,
         "event_type": "", "value": 4.0, "props": None},
        # --- ns-range edge class (round 7): TIMESTAMP(NANOS) is int64
        # nanoseconds, representable only within 1677-09-21T00:12:43.145Z
        # .. 2262-04-11T23:47:16.854Z — the deep-past/far-future rows a
        # corrupt clock or mis-parsed epoch ships at 100 TB. Near-max
        # stresses century-scale gap arithmetic, week floors at +9.2e18ns,
        # and µs conversions; near-min stresses the most-negative epoch
        # week/date extraction. Both micro-aligned (io.py contract).
        {"event_id": BASE_ID + 15, "ts": datetime(2262, 4, 11, 12, 0, 0),
         "user_id": 15, "event_type": "view", "value": 1.0,
         "props": None},
        {"event_id": BASE_ID + 16, "ts": datetime(1677, 9, 22, 0, 0, 1),
         "user_id": 15, "event_type": "click", "value": 2.0,
         "props": None},
        # huge-finite value (round 7): quantization contract on events
        {"event_id": BASE_ID + 17, "ts": ts0, "user_id": 15,
         "event_type": "view", "value": 1e300, "props": None},
        # duplicate JSON key (round 7): both engines take the FIRST
        # occurrence (probed: Spark get_json_object and DuckDB
        # json_extract agree) — pinned so a parser change surfaces
        {"event_id": BASE_ID + 18, "ts": ts0, "user_id": 15,
         "event_type": "click", "value": 5.0,
         "props": '{"k": 1, "k": 2}'},
        # IEEE negative zero (round 7): groups with +0.0 on both engines
        # and must never leak a '-0.0'-vs-'0.0' repr split into output.
        # The JSON -0.0 k also pins the integral-numeral contract: Spark
        # ANSI CAST('-0.0' AS BIGINT) throws, DuckDB's returns 0.
        {"event_id": BASE_ID + 19, "ts": ts0, "user_id": 15,
         "event_type": "view", "value": -0.0, "props": '{"k": -0.0}'},
        # non-integral / non-numeric / overflow k (round 7): a JSON 2.5
        # TRUNCATES to 2 in Spark's variant cast but ROUNDS to 3 in
        # DuckDB's string->int cast; 3.0 is a DOUBLE token with an
        # integral value; "7" is a string; the 20-digit numeral
        # overflows int64. None has an agreed integer reading -> all are
        # NULL/quarantined under the integral-token contract.
        {"event_id": BASE_ID + 20, "ts": ts0, "user_id": 15,
         "event_type": "click", "value": 1.0, "props": '{"k": 2.5}'},
        {"event_id": BASE_ID + 21, "ts": ts0, "user_id": 15,
         "event_type": "view", "value": 1.0, "props": '{"k": 3.0}'},
        {"event_id": BASE_ID + 22, "ts": ts0, "user_id": 15,
         "event_type": "click", "value": 1.0, "props": '{"k": "7"}'},
        {"event_id": BASE_ID + 23, "ts": ts0, "user_id": 15,
         "event_type": "view", "value": 1.0,
         "props": '{"k": 99999999999999999999}'},
        # composite k (round 7): arrays/objects are not integers on any
        # surface — NULL under the string/typed contracts, quarantined
        # by the declared-schema parse
        {"event_id": BASE_ID + 24, "ts": ts0, "user_id": 15,
         "event_type": "click", "value": 1.0, "props": '{"k": [1, 2]}'},
        {"event_id": BASE_ID + 25, "ts": ts0, "user_id": 15,
         "event_type": "view", "value": 1.0, "props": '{"k": {"a": 1}}'},
        # --- exact-replay class (round 7b): the SAME event row TWICE,
        # byte-identical (a replayed log batch). Indistinguishable rows
        # make every window order total BY VALUE — row_number hands 1/2
        # to interchangeable rows — so only uniqueness ASSUMPTIONS can
        # diverge (count distinct vs count, event_id joins fanning out).
        {"event_id": BASE_ID + 26, "ts": ts0, "user_id": 16,
         "event_type": "click", "value": 9.0, "props": '{"k": 9}'},
        {"event_id": BASE_ID + 26, "ts": ts0, "user_id": 16,
         "event_type": "click", "value": 9.0, "props": '{"k": 9}'},
        # reused event_id at a DIFFERENT ts with a different payload (an
        # id recycled across time): (ts, event_id) window orders stay
        # total; only id-keyed dedup/join paths see the collision.
        {"event_id": BASE_ID + 27, "ts": ts0, "user_id": 16,
         "event_type": "view", "value": 1.0, "props": None},
        {"event_id": BASE_ID + 27, "ts": ts0 + timedelta(hours=1),
         "user_id": 16, "event_type": "purchase", "value": 2.0,
         "props": None},
        # --- degenerate-JSON class (round 7b): empty/whitespace props
        # have no JSON token at all (malformed, like '{bad json'); bare
        # 'null'/'[]'/'123' are VALID JSON with no object member to
        # extract ($.k is NULL on both engines); '{}' is a valid object
        # missing the key. None may crash a parser or leak an engine-
        # specific reading into extraction/quarantine output.
        {"event_id": BASE_ID + 28, "ts": ts0, "user_id": 16,
         "event_type": "click", "value": 1.0, "props": ""},
        {"event_id": BASE_ID + 29, "ts": ts0, "user_id": 16,
         "event_type": "view", "value": 1.0, "props": "   "},
        {"event_id": BASE_ID + 30, "ts": ts0, "user_id": 16,
         "event_type": "click", "value": 1.0, "props": "null"},
        {"event_id": BASE_ID + 31, "ts": ts0, "user_id": 16,
         "event_type": "view", "value": 1.0, "props": "[]"},
        {"event_id": BASE_ID + 32, "ts": ts0, "user_id": 16,
         "event_type": "click", "value": 1.0, "props": "123"},
        {"event_id": BASE_ID + 33, "ts": ts0, "user_id": 16,
         "event_type": "view", "value": 1.0, "props": "{}"},
        # subnormal double (round 7b2): the smallest positive IEEE value —
        # sums, rounding and comparisons must treat it identically (it
        # rounds to 0 at any printed precision but is > 0 in filters)
        {"event_id": BASE_ID + 34, "ts": ts0, "user_id": 16,
         "event_type": "view", "value": 5e-324, "props": None},
        # int64-EDGE event/user ids (round 7b3): see the documents rows
        {"event_id": 2**63 - 1, "ts": ts0, "user_id": 2**63 - 1,
         "event_type": "view", "value": 1.0, "props": None},
        {"event_id": -(2**63), "ts": ts0, "user_id": -(2**63),
         "event_type": "click", "value": 2.0, "props": '{"k": 3}'},
        # microsecond-precision session-gap boundaries (round 7b3): gaps
        # of exactly 30min - 1us (same session on every gap rule) and
        # 30min + 1us (closes on every rule) — interval comparisons and
        # epoch()-fraction arithmetic must agree at full us precision,
        # not just whole seconds.
        {"event_id": BASE_ID + 36, "ts": ts0, "user_id": 18,
         "event_type": "view", "value": 1.0, "props": None},
        {"event_id": BASE_ID + 37,
         "ts": ts0 + timedelta(minutes=30, microseconds=-1),
         "user_id": 18, "event_type": "click", "value": 2.0,
         "props": None},
        {"event_id": BASE_ID + 38,
         "ts": ts0 + timedelta(minutes=60), "user_id": 18,
         "event_type": "purchase", "value": 3.0, "props": None},
        # CONFLICTING duplicate at the same (ts, event_id) (round 7b3): a
        # replayed batch carrying a mutation. Any "latest"/ordering
        # contract built on (ts, event_id) alone ties engine-arbitrarily
        # here — found live: Spark's struct-max and the oracle's
        # row_number picked OPPOSITE rows; orders must totalize every
        # EMITTED field (event_type, value here; props is never emitted
        # by an order-sensitive query).
        {"event_id": BASE_ID + 35, "ts": ts0, "user_id": 17,
         "event_type": "click", "value": 1.0, "props": None},
        {"event_id": BASE_ID + 35, "ts": ts0, "user_id": 17,
         "event_type": "view", "value": 2.0, "props": None},
        # --- DST/leap class (round 8): CBS/statline data is Dutch, and
        # local-time strings round-trip through Europe/Amsterdam
        # transitions. The engine pins UTC everywhere, so these must be
        # pure no-divergence rows — any query that silently localizes
        # (hour extraction, day bucketing, session gaps) diverges here
        # first. One user (19) walks through the 2024 spring-forward
        # instant (01:00:00Z = 02:00→03:00 CEST skip) and the fall-back
        # instant (01:00:00Z = 03:00→02:00 ambiguous hour) with ±1µs
        # neighbors; leap-day end and a leap-second-adjacent midnight
        # (23:59:59.999999 → 00:00:00, 2016-12-31 had a leap second)
        # ride along for date-boundary arithmetic.
        {"event_id": BASE_ID + 39,
         "ts": datetime(2024, 3, 31, 0, 59, 59, 999999), "user_id": 19,
         "event_type": "view", "value": 1.0, "props": None},
        {"event_id": BASE_ID + 40, "ts": datetime(2024, 3, 31, 1, 0, 0),
         "user_id": 19, "event_type": "click", "value": 2.0, "props": None},
        {"event_id": BASE_ID + 41,
         "ts": datetime(2024, 3, 31, 1, 0, 0, 1), "user_id": 19,
         "event_type": "click", "value": 3.0, "props": None},
        {"event_id": BASE_ID + 42,
         "ts": datetime(2024, 10, 27, 0, 59, 59, 999999), "user_id": 19,
         "event_type": "view", "value": 4.0, "props": None},
        {"event_id": BASE_ID + 43, "ts": datetime(2024, 10, 27, 1, 0, 0),
         "user_id": 19, "event_type": "click", "value": 5.0, "props": None},
        {"event_id": BASE_ID + 44, "ts": datetime(2024, 10, 27, 2, 0, 0),
         "user_id": 19, "event_type": "purchase", "value": 6.0,
         "props": None},
        {"event_id": BASE_ID + 45,
         "ts": datetime(2024, 2, 29, 23, 59, 59, 999999), "user_id": 19,
         "event_type": "view", "value": 7.0, "props": None},
        {"event_id": BASE_ID + 46,
         "ts": datetime(2016, 12, 31, 23, 59, 59, 999999), "user_id": 19,
         "event_type": "view", "value": 8.0, "props": None},
        {"event_id": BASE_ID + 47, "ts": datetime(2017, 1, 1, 0, 0, 0),
         "user_id": 19, "event_type": "click", "value": 9.0, "props": None},
        # --- NULL-PK class (round 8): an event with NULL event_id AND a
        # tied timestamp (ts0 is shared by many dirty rows) — the session
        # island scans order by (ts, event_id), so a NULL id inside a tie
        # group pins NULLS FIRST/LAST agreement between the engines.
        {"event_id": None, "ts": ts0, "user_id": 16,
         "event_type": "click", "value": 10.0, "props": None},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


NAN = float("nan")
INF = float("inf")
NEG_INF = float("-inf")


def dirty_orders(tbl: pa.Table) -> pa.Table:
    first = tbl.slice(0, 1).to_pylist()[0]
    d0 = first["o_orderdate"]
    rows = [
        # guest checkout: no customer key (FK hole)
        {"o_orderkey": BASE_ID + 0, "o_custkey": None, "o_orderstatus": "O",
         "o_totalprice": 10.0, "o_orderdate": d0, "o_orderpriority": "1-URGENT"},
        # dangling FK: customer that does not exist
        {"o_orderkey": BASE_ID + 1, "o_custkey": BASE_ID + 999,
         "o_orderstatus": "F", "o_totalprice": 20.0, "o_orderdate": d0,
         "o_orderpriority": "2-HIGH"},
        # dateless order (NULL sorts FIRST in Spark, LAST in DuckDB)
        {"o_orderkey": BASE_ID + 2, "o_custkey": first["o_custkey"],
         "o_orderstatus": "O", "o_totalprice": 30.0, "o_orderdate": None,
         "o_orderpriority": "3-MEDIUM"},
        # priceless order (NULL in sums/avgs/rank keys)
        {"o_orderkey": BASE_ID + 3, "o_custkey": first["o_custkey"],
         "o_orderstatus": "O", "o_totalprice": None, "o_orderdate": d0,
         "o_orderpriority": None},
        # NaN price (engines disagree on NaN grouping/order more than NULL)
        {"o_orderkey": BASE_ID + 4, "o_custkey": first["o_custkey"],
         "o_orderstatus": "O", "o_totalprice": NAN, "o_orderdate": d0,
         "o_orderpriority": "4-NOT SPECIFIED"},
        # pre-epoch order date (negative epoch seconds)
        {"o_orderkey": BASE_ID + 5, "o_custkey": first["o_custkey"],
         "o_orderstatus": "F", "o_totalprice": 50.0,
         "o_orderdate": datetime(1969, 12, 31, 23, 0, 0),
         "o_orderpriority": "5-LOW"},
        # statusless order (NULL group key)
        {"o_orderkey": BASE_ID + 6, "o_custkey": first["o_custkey"],
         "o_orderstatus": None, "o_totalprice": 60.0, "o_orderdate": d0,
         "o_orderpriority": "1-URGENT"},
        # infinite price: Spark's ANSI cast(Inf AS DECIMAL) is NULL while
        # DuckDB sums Inf through doubles — an isnan-only scrub is an
        # incomplete mirror of the decimal-cast contract
        {"o_orderkey": BASE_ID + 7, "o_custkey": first["o_custkey"],
         "o_orderstatus": "O", "o_totalprice": INF, "o_orderdate": d0,
         "o_orderpriority": "2-HIGH"},
        # finite-but-HUGE price (1e300): outside every decimal's domain —
        # the round-6 quantization contract (_quantizable). A bare ANSI
        # decimal cast throws NUMERIC_VALUE_OUT_OF_RANGE, bigint cents
        # arithmetic throws ARITHMETIC_OVERFLOW, DuckDB's CAST raises a
        # Conversion Error. Status 'O' on purpose: the open-order paths
        # (receivables_aging, filtered_agg_sql's open_cents) must see it.
        {"o_orderkey": BASE_ID + 8, "o_custkey": first["o_custkey"],
         "o_orderstatus": "O", "o_totalprice": 1e300, "o_orderdate": d0,
         "o_orderpriority": "3-MEDIUM"},
        # 5e13: INSIDE the default DECIMAL(20,6) domain (|x| < 1e14) but
        # OUTSIDE DECIMAL(18,6)'s (|x| < 1e12) — pins the per-target-
        # decimal bound (_quantizable(bound=1e12) in order_price_moments)
        # and stresses downstream bigint arithmetic on in-domain sums.
        {"o_orderkey": BASE_ID + 9, "o_custkey": first["o_custkey"],
         "o_orderstatus": "F", "o_totalprice": 5e13, "o_orderdate": d0,
         "o_orderpriority": "4-NOT SPECIFIED"},
        # --- duplicate-key class (round 7): the SAME o_orderkey twice
        # with CONFLICTING payloads — a replayed CDC batch or a double
        # write. Any merge/upsert/latest-per-key path that assumes key
        # uniqueness, or breaks its tie on a non-key column, goes
        # engine-defined here; deterministic pipelines must tie-break on
        # a total order.
        {"o_orderkey": BASE_ID + 10, "o_custkey": first["o_custkey"],
         "o_orderstatus": "O", "o_totalprice": 70.0, "o_orderdate": d0,
         "o_orderpriority": "1-URGENT"},
        {"o_orderkey": BASE_ID + 10, "o_custkey": first["o_custkey"],
         "o_orderstatus": "F", "o_totalprice": 80.0,
         "o_orderdate": datetime(1996, 6, 1),
         "o_orderpriority": "5-LOW"},
        # int64-EDGE order keys (round 7b3): the max-key order joins an
        # edge lineitem below; label codecs and key checksums must
        # survive 19/20-char and negative ids
        {"o_orderkey": 2**63 - 1, "o_custkey": first["o_custkey"],
         "o_orderstatus": "F", "o_totalprice": 42.0, "o_orderdate": d0,
         "o_orderpriority": "1-URGENT"},
        {"o_orderkey": -(2**63), "o_custkey": 2**63 - 1,
         "o_orderstatus": "O", "o_totalprice": 43.0, "o_orderdate": d0,
         "o_orderpriority": "2-HIGH"},
        # --- calendar-extreme class (round 7b): proleptic-Gregorian
        # edges a sentinel 9999 or a mis-parsed two-digit year ships at
        # 100 TB. Micros-representable on both engines; stresses year/
        # quarter/week extraction, ±8000-year datediff spans, and epoch
        # bigint math. The 9999 order is OPEN on purpose (a far-future
        # open order gives aging paths a negative age).
        {"o_orderkey": BASE_ID + 11, "o_custkey": first["o_custkey"],
         "o_orderstatus": "O", "o_totalprice": 90.0,
         "o_orderdate": datetime(9999, 12, 31, 23, 59, 59),
         "o_orderpriority": "2-HIGH"},
        {"o_orderkey": BASE_ID + 12, "o_custkey": first["o_custkey"],
         "o_orderstatus": "F", "o_totalprice": 95.0,
         "o_orderdate": datetime(1, 1, 1),
         "o_orderpriority": "3-MEDIUM"},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_lineitem(tbl: pa.Table) -> pa.Table:
    first = tbl.slice(0, 1).to_pylist()[0]
    d0 = first["l_shipdate"]
    base = {
        "l_orderkey": first["l_orderkey"], "l_partkey": first["l_partkey"],
        "l_suppkey": first["l_suppkey"], "l_quantity": 1.0,
        "l_extendedprice": 100.0, "l_discount": 0.05, "l_tax": 0.02,
        "l_returnflag": "N", "l_linestatus": "O", "l_shipdate": d0,
    }
    rows = [
        # orphan line: order that does not exist
        dict(base, l_orderkey=BASE_ID + 0, l_linenumber=101),
        # returned line with NEGATIVE quantity and price (a credit)
        dict(base, l_linenumber=102, l_quantity=-2.0,
             l_extendedprice=-200.0, l_returnflag="R"),
        # NULL quantity/price/discount/tax (feed every aggregate a NULL)
        dict(base, l_linenumber=103, l_quantity=None, l_extendedprice=None,
             l_discount=None, l_tax=None),
        # shipless line (NULL date in window/order keys)
        dict(base, l_linenumber=104, l_shipdate=None),
        # NULL flag/status (NULL group keys on the classic Q1 grain)
        dict(base, l_linenumber=105, l_returnflag=None, l_linestatus=None),
        # absurd discount > 1 (revenue formulas go negative)
        dict(base, l_linenumber=106, l_discount=1.5),
        # NULL part/supp keys (FK holes into part/supplier joins)
        dict(base, l_linenumber=107, l_partkey=None, l_suppkey=None),
        # NaN measures (IEEE NaN poisons double sums; decimal casts must
        # scrub it the same way on both engines — pins the moment queries)
        dict(base, l_linenumber=108, l_quantity=NAN, l_extendedprice=NAN,
             l_discount=NAN, l_tax=NAN),
        # +/-Inf measures (floor(Inf) and BIGINT casts crash or saturate
        # differently per engine; decimal casts NULL them only in Spark)
        dict(base, l_linenumber=109, l_quantity=INF, l_extendedprice=INF,
             l_discount=NEG_INF, l_tax=INF),
        # --- huge-finite class on lineitem (round 7, extending the
        # orders 1e300 pin): each money/qty factor 1e300 on its own row —
        # outside every decimal/bigint quantization domain. Shipdate is
        # pinned INSIDE the repo's common 1997 filter windows (Q1 and the
        # full year) so every TPC-H-shaped revenue composite sees the
        # rows regardless of which base SF the sweep replays on — a
        # filter must never be the only thing between a corrupt measure
        # and a job-killing ANSI cast.
        dict(base, l_linenumber=110, l_extendedprice=1e300,
             l_shipdate=datetime(1997, 2, 15)),
        dict(base, l_linenumber=111, l_quantity=1e300,
             l_shipdate=datetime(1997, 2, 15)),
        dict(base, l_linenumber=112, l_discount=1e300, l_tax=1e300,
             l_shipdate=datetime(1997, 2, 15)),
        # 5e13 discount: every FACTOR passes a per-factor |x| < 1e14
        # guard, but price*(1-discount) explodes to ~5e15 and its cents
        # overflow bigint — revenue formulas must guard the PRODUCT (the
        # expression actually quantized), not just the inputs.
        dict(base, l_linenumber=113, l_discount=5e13,
             l_shipdate=datetime(1997, 2, 15)),
        # int64-EDGE keys on lineitem (round 7b3): a line of the max-key
        # order plus dangling edge part/supp keys
        dict(base, l_orderkey=2**63 - 1, l_linenumber=116),
        dict(base, l_orderkey=-(2**63), l_partkey=2**63 - 1,
             l_suppkey=-(2**63), l_linenumber=117),
        # calendar-extreme shipdates (round 7b): clean measures, only
        # the DATE arithmetic is stressed. The year-1 row passes every
        # "shipdate <= X" Q1-style filter; the 9999 row reaches only
        # unbounded scans.
        dict(base, l_linenumber=114, l_shipdate=datetime(9999, 12, 31)),
        dict(base, l_linenumber=115, l_shipdate=datetime(1, 1, 2)),
        # NULL JOIN key (round 8): a line with no order — every
        # orders⋈lineitem equi-join must drop it identically (NULL never
        # equals NULL); per-orderkey groupers keep a NULL group
        dict(base, l_orderkey=None, l_linenumber=118),
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_customer(tbl: pa.Table) -> pa.Table:
    rows = [
        # anonymized customer: NULL name/segment/balance
        {"c_custkey": BASE_ID + 0, "c_name": None, "c_nationkey": 0,
         "c_acctbal": None, "c_mktsegment": None},
        # stateless customer: NULL nation (FK hole into nation joins)
        {"c_custkey": BASE_ID + 1, "c_name": "Customer#dirty1",
         "c_nationkey": None, "c_acctbal": 0.0, "c_mktsegment": "BUILDING"},
        # dangling nation FK + unicode name (byte-order vs collation sorts)
        {"c_custkey": BASE_ID + 2, "c_name": "Ωmega Čustomer 客户",
         "c_nationkey": 99, "c_acctbal": -999.99, "c_mktsegment": "BUILDING"},
        # NaN balance
        {"c_custkey": BASE_ID + 3, "c_name": "Customer#dirty3",
         "c_nationkey": 1, "c_acctbal": NAN, "c_mktsegment": "MACHINERY"},
        # infinite balance (the non-finite-measure contract on dims too)
        {"c_custkey": BASE_ID + 4, "c_name": "Customer#dirty4",
         "c_nationkey": 1, "c_acctbal": INF, "c_mktsegment": "MACHINERY"},
        # empty-string segment (distinct from NULL; '' vs NULL grouping).
        # Fresh key: BASE_ID+4 is taken by the Inf-balance row above —
        # sharing it would collapse two distinct dirty cases into one
        # customer in any per-custkey join/group/dedup.
        {"c_custkey": BASE_ID + 5, "c_name": "", "c_nationkey": 1,
         "c_acctbal": 1.0, "c_mktsegment": ""},
        # huge-finite balance (round 7): the quantization contract on
        # dimension measures too
        {"c_custkey": BASE_ID + 6, "c_name": "Customer#dirty6",
         "c_nationkey": 1, "c_acctbal": 1e300, "c_mktsegment": "MACHINERY"},
        # int64-EDGE customer keys (round 7b3)
        {"c_custkey": 2**63 - 1, "c_name": "Customer#edgemax",
         "c_nationkey": 1, "c_acctbal": 1.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": -(2**63), "c_name": "Customer#edgemin",
         "c_nationkey": 1, "c_acctbal": 2.0, "c_mktsegment": "MACHINERY"},
        # DUPLICATE c_custkey with a CONFLICTING payload (round 7b2): a
        # dimension key duplicated by a double-loaded batch. Every
        # customer equi-join fans out over BOTH rows identically on both
        # engines; per-custkey groupers see one key twice — divergence
        # means a pair assumed dimension-key uniqueness.
        {"c_custkey": BASE_ID + 7, "c_name": "Customer#dup7a",
         "c_nationkey": 1, "c_acctbal": 10.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": BASE_ID + 7, "c_name": "Customer#dup7b",
         "c_nationkey": 2, "c_acctbal": 20.0, "c_mktsegment": "MACHINERY"},
        # NULL PRIMARY key (round 8): a key-less dimension row. Equi-joins
        # drop it on both engines (NULL != NULL); per-key groupers keep a
        # NULL group — divergence means a pair disagreed on which.
        {"c_custkey": None, "c_name": "Customer#nullkey",
         "c_nationkey": 1, "c_acctbal": 5.0, "c_mktsegment": "BUILDING"},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_supplier(tbl: pa.Table) -> pa.Table:
    rows = [
        # nameless supplier with NULL balance
        {"s_suppkey": BASE_ID + 0, "s_name": None, "s_nationkey": 0,
         "s_acctbal": None},
        # stateless supplier (NULL nation key)
        {"s_suppkey": BASE_ID + 1, "s_name": "Supplier#dirty1",
         "s_nationkey": None, "s_acctbal": 100.0},
        # near-duplicate name (fuzzy-match bait) + NaN balance
        {"s_suppkey": BASE_ID + 2, "s_name": "Supplier#000000001x",
         "s_nationkey": 1, "s_acctbal": NAN},
        # infinite balance (non-finite-measure contract on supplier dims;
        # Inf < 0 is FALSE on both engines, so negative-balance filters
        # must exclude it rather than crash downstream arithmetic)
        {"s_suppkey": BASE_ID + 3, "s_name": "Supplier#dirty3",
         "s_nationkey": 1, "s_acctbal": INF},
        # huge-finite balance (round 7): quantization contract on supplier
        {"s_suppkey": BASE_ID + 4, "s_name": "Supplier#dirty4",
         "s_nationkey": 1, "s_acctbal": 1e300},
        # int64-EDGE supplier keys (round 7b3): identical names make them
        # a guaranteed fuzzy-match pair — the key-checksum path must
        # survive |a|+|b| ~ 2^64
        {"s_suppkey": 2**63 - 1, "s_name": "Supplier#edge",
         "s_nationkey": 1, "s_acctbal": 10.0},
        {"s_suppkey": -(2**63), "s_name": "Supplier#edge",
         "s_nationkey": 1, "s_acctbal": 20.0},
        # NULL PRIMARY key (round 8)
        {"s_suppkey": None, "s_name": "Supplier#nullkey",
         "s_nationkey": 1, "s_acctbal": 5.0},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_part(tbl: pa.Table) -> pa.Table:
    rows = [
        # unnamed/untyped part (NULL string groupers), NULL price
        {"p_partkey": BASE_ID + 0, "p_name": None, "p_brand": None,
         "p_type": None, "p_size": None, "p_retailprice": None},
        # zero-size free part (degenerate numerics)
        {"p_partkey": BASE_ID + 1, "p_name": "dirty zero part",
         "p_brand": "Brand#00", "p_type": "DIRTY TYPE", "p_size": 0,
         "p_retailprice": 0.0},
        # NaN price, empty-string type
        {"p_partkey": BASE_ID + 2, "p_name": "dirty nan part",
         "p_brand": "Brand#00", "p_type": "", "p_size": 1,
         "p_retailprice": NAN},
        # +/-Inf prices (the non-finite-measure contract on part too: a
        # price average must not go Inf on one engine and NULL-skip on
        # the other; name avoids the q_profit LIKE '%red%' slice, and no
        # lineitem references BASE_ID keys, so join-gated measures stay
        # untouched while full-table scans see the rows)
        {"p_partkey": BASE_ID + 3, "p_name": "dirty inf part",
         "p_brand": "Brand#00", "p_type": "DIRTY TYPE", "p_size": 2,
         "p_retailprice": INF},
        {"p_partkey": BASE_ID + 4, "p_name": "dirty neginf part",
         "p_brand": "Brand#00", "p_type": "DIRTY TYPE", "p_size": 2,
         "p_retailprice": NEG_INF},
        # huge-finite price (round 7): quantization contract on part
        {"p_partkey": BASE_ID + 5, "p_name": "dirty huge part",
         "p_brand": "Brand#00", "p_type": "DIRTY TYPE", "p_size": 2,
         "p_retailprice": 1e300},
        # int64-EDGE part keys (round 7b3)
        {"p_partkey": 2**63 - 1, "p_name": "edge part max",
         "p_brand": "Brand#00", "p_type": "DIRTY TYPE", "p_size": 3,
         "p_retailprice": 1.0},
        {"p_partkey": -(2**63), "p_name": "edge part min",
         "p_brand": "Brand#00", "p_type": "DIRTY TYPE", "p_size": 3,
         "p_retailprice": 2.0},
        # NULL PRIMARY key (round 8)
        {"p_partkey": None, "p_name": "null key part",
         "p_brand": "Brand#00", "p_type": "DIRTY TYPE", "p_size": 1,
         "p_retailprice": 3.0},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_nation(tbl: pa.Table) -> pa.Table:
    rows = [
        # nameless nation in a real region (NULL label in decode joins)
        {"n_nationkey": 90, "n_name": None, "n_regionkey": 0},
        # nation with a dangling region FK
        {"n_nationkey": 91, "n_name": "DIRTYLAND", "n_regionkey": 99},
        # nation with NULL region key
        {"n_nationkey": 92, "n_name": "NOWHERE", "n_regionkey": None},
        # nation routed to the NULL-named dirty region (round 7b): the
        # NULL label flows through a REAL region join, not just a
        # dangling FK — decode/star joins must carry the NULL group
        {"n_nationkey": 93, "n_name": "NULLREGIONIA", "n_regionkey": 98},
        # NULL PRIMARY key (round 8): NULL n_nationkey in a real region —
        # every customer/supplier->nation equi-join must drop it
        {"n_nationkey": None, "n_name": "KEYLESSLAND", "n_regionkey": 0},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def dirty_region(tbl: pa.Table) -> pa.Table:
    rows = [
        # NULL-named region reachable via nation 93 (round 7b)
        {"r_regionkey": 98, "r_name": None},
        # empty-string name: distinct from NULL in grouping/decodes
        {"r_regionkey": 97, "r_name": ""},
        # NULL PRIMARY key (round 8)
        {"r_regionkey": None, "r_name": "KEYLESS REGION"},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def _dup_corpus_id(tbl: pa.Table) -> int:
    """A corpus-side (vec_id >= 20) id that already exists in the base
    table — queries are vec_id < 10 everywhere in the workload, so the
    duplicate lands on the searched side, not the query set."""
    for v in tbl.column("vec_id").to_pylist():
        if v >= 20:
            return v
    return 20


def dirty_embeddings(tbl: pa.Table) -> pa.Table:
    dim = len(tbl.column("embedding")[0].as_py())
    first_vec = tbl.column("embedding")[0].as_py()
    rows = [
        # failed encoder call
        {"vec_id": BASE_ID + 0, "embedding": None, "label": None},
        # zero-norm vector (cosine undefined; ANSI divide hazard)
        {"vec_id": BASE_ID + 1, "embedding": [0.0] * dim, "label": 0},
        # exact duplicate vector, NULL label
        {"vec_id": BASE_ID + 2, "embedding": first_vec, "label": None},
        # NaN/Inf COMPONENT (round 6): a half-failed encoder output. One
        # poisoned component makes every similarity NaN — which Spark's
        # max_by/top-k ranks GREATEST — overflows int8/bigint
        # quantization, and crashes decimal centroid sums; the uniform
        # usable-vector contract (similarity._drop_null_vectors) must
        # exclude the whole vector on every similarity/fit path.
        {"vec_id": BASE_ID + 3,
         "embedding": first_vec[:3] + [NAN] + first_vec[4:], "label": 1},
        {"vec_id": BASE_ID + 4,
         "embedding": first_vec[:5] + [INF] + first_vec[6:], "label": 2},
        # NULL COMPONENT (round 7): the three-valued-logic cousin of the
        # NaN component. Spark's exists-lambda over it evaluates to NULL
        # (row dropped by accident), while an oracle that counts
        # non-finite components keeps it (NOT isfinite(NULL) is NULL,
        # never TRUE) — the usable-vector contract must reject it
        # EXPLICITLY on both engines (isNull in the Spark lambda, the
        # length-equality list_filter form in _SQL_FINITE_VEC).
        {"vec_id": BASE_ID + 5,
         "embedding": first_vec[:7] + [None] + first_vec[8:], "label": 1},
        # SHAPE anomalies (round 7): an EMPTY embedding and a truncated
        # 32-dim one (a half-written row or a mixed-model feed). DuckDB's
        # list_cosine_similarity/list_inner_product CRASH outright on
        # dimension mismatch (and internally on empty lists), while
        # Spark's zip_with silently NULL-pads — the usable-vector
        # contract gains a declared-dimensionality clause so both
        # engines exclude them identically.
        {"vec_id": BASE_ID + 6, "embedding": [], "label": 0},
        {"vec_id": BASE_ID + 7, "embedding": first_vec[: dim // 2],
         "label": 2},
        # DUPLICATE vec_id with a DIFFERENT vector (round 7, the
        # duplicate-key class on embeddings): a double-encoded document.
        # Any candidate dedup keyed on (q_id, neighbor_id) alone picks an
        # engine-arbitrary representative unless the pipeline's tie-break
        # is total; the exact brute-force path must instead score BOTH
        # rows deterministically.
        {"vec_id": _dup_corpus_id(tbl),
         "embedding": [float(i % 7 - 3) for i in range(dim)], "label": 2},
        # IEEE -0.0 component (round 7b): bit-distinct from +0.0 but
        # arithmetically equal — dot products/norms/quantization must
        # treat it as zero and never leak a '-0.0' repr into output
        {"vec_id": BASE_ID + 8, "embedding": [-0.0] + first_vec[1:],
         "label": 0},
        # int64-EDGE vec_ids (round 7b3), corpus side (>= 20), on
        # DIFFERENT labels so each per-label id checksum carries ONE
        # extreme (a bigint sum would overflow order-dependently)
        {"vec_id": 2**63 - 1, "embedding": first_vec, "label": 0},
        {"vec_id": -(2**63), "embedding": first_vec, "label": 1},
        # huge/tiny-component vectors (round 7b3): FINITE components at
        # ±1e300 / 1e-300 pass the usable-vector contract but the norm²
        # overflows to Inf (or underflows to 0) AT SCORING TIME — pinned
        # as a no-divergence class: IEEE Inf/0-norm arithmetic flows
        # through try_divide/list_cosine_similarity identically on both
        # engines under the existing guards (probed green on the full
        # registry before landing).
        {"vec_id": BASE_ID + 10, "embedding": [1e300] * dim, "label": 0},
        {"vec_id": BASE_ID + 11,
         "embedding": [1e300, -1e300] * (dim // 2), "label": 1},
        {"vec_id": BASE_ID + 12,
         "embedding": first_vec[:1] + [1e300] + first_vec[2:], "label": 2},
        {"vec_id": BASE_ID + 13, "embedding": [1e-300] * dim, "label": 0},
        # CONSTANT vector (round 7b2): per-component variance is exactly
        # zero — z-score/whitening/stddev normalizations hit an ANSI
        # DIVIDE_BY_ZERO or a NaN unless guarded; usable (finite,
        # right-dimensioned, nonzero norm) so no contract excludes it.
        {"vec_id": BASE_ID + 9, "embedding": [5.0] * dim, "label": 1},
        # NULL PRIMARY key (round 8): an id-less but USABLE vector on the
        # corpus side — similarity paths must score it (content is fine),
        # id-keyed equi-joins must drop it, and the vec_id < 10 query
        # window must exclude it on both engines (NULL < 10 is NULL).
        {"vec_id": None, "embedding": first_vec, "label": 2},
    ]
    extra = pa.Table.from_pylist(rows, schema=tbl.schema)
    return pa.concat_tables([tbl, extra])


def build(base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "documents":
            pq.write_table(dirty_documents(pq.read_table(src)), dst)
        elif t == "embeddings":
            pq.write_table(dirty_embeddings(pq.read_table(src)), dst)
        elif t == "events":
            pq.write_table(dirty_events(pq.read_table(src)), dst)
        elif t == "orders":
            pq.write_table(dirty_orders(pq.read_table(src)), dst)
        elif t == "lineitem":
            pq.write_table(dirty_lineitem(pq.read_table(src)), dst)
        elif t == "customer":
            pq.write_table(dirty_customer(pq.read_table(src)), dst)
        elif t == "supplier":
            pq.write_table(dirty_supplier(pq.read_table(src)), dst)
        elif t == "part":
            pq.write_table(dirty_part(pq.read_table(src)), dst)
        elif t == "nation":
            pq.write_table(dirty_nation(pq.read_table(src)), dst)
        elif t == "region":
            pq.write_table(dirty_region(pq.read_table(src)), dst)
        else:
            shutil.copyfile(src, dst)
    print(f"wrote dirty SF to {out}")


# --------------------------------------------------------------------------
# skewed-key fixture (round 8)
# --------------------------------------------------------------------------
#
# The dirty catalog above stresses VALUES; this builder stresses KEY
# DISTRIBUTION — the classic 100 TB failure mode where one user holds
# ~half the events, one customer ~half the orders, and one order key
# ~half the lineitems (bot traffic, a default/test account, a bulk
# order). Every per-key operator (session windows, as-of joins, per-key
# top-k, groupBy fan-in) suddenly has one partition-dominating key;
# parity on the SAME skewed data proves the semantics hold, and the
# bench contract (tests/test_bench_contract.py) checks the hot-key plans
# stay spill-free.


def _skew_column(tbl: pa.Table, col: str, frac: float) -> pa.Table:
    """Rewrite every ⌊1/frac⌋-th row's ``col`` to the column's minimum
    non-null value — a deterministic, existing hot key absorbing ~frac
    of the table without changing row count or schema."""
    import pyarrow.compute as pc

    tbl = tbl.combine_chunks()
    arr = tbl[col].combine_chunks()
    hot = pc.min(arr).as_py()
    step = max(2, round(1 / frac))
    mask = pa.array([i % step == 0 for i in range(len(tbl))])
    new = pc.if_else(mask, pa.scalar(hot, type=arr.type), arr)
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, tbl.schema.field(i), new)


def _renumber_hot_linenumbers(tbl: pa.Table, frac: float) -> pa.Table:
    """After skewing l_orderkey, keep (l_orderkey, l_linenumber) unique:
    the skew class stresses key distribution, not PK conflicts (the
    conflicting-duplicate dirty class owns that), so the rewritten rows
    get fresh linenumbers above any natural value (base 1000)."""
    import pyarrow.compute as pc

    step = max(2, round(1 / frac))
    n = len(tbl)
    mask = pa.array([i % step == 0 for i in range(n)])
    fresh = pa.array(
        [1000 + i // step for i in range(n)],
        type=tbl["l_linenumber"].type,
    )
    i = tbl.schema.get_field_index("l_linenumber")
    new = pc.if_else(mask, fresh, tbl["l_linenumber"].combine_chunks())
    return tbl.set_column(i, tbl.schema.field(i), new)


def _skew_content(tbl: pa.Table, col: str, frac: float) -> pa.Table:
    """Rewrite every ⌊1/frac⌋-th row's ``col`` to the FIRST row's value —
    content skew with ids untouched: one boilerplate text (or one stuck
    encoder output) held by ~frac of the corpus. Stresses the paths key
    skew can't reach: exact-dedup groups of half the table, shingle
    document frequencies at the df-cap, MinHash/SimHash bucket caps, and
    IVF/k-means centroid collapse onto the hot vector."""
    import pyarrow.compute as pc

    tbl = tbl.combine_chunks()
    arr = tbl[col].combine_chunks()
    hot = arr[0]
    step = max(2, round(1 / frac))
    mask = pa.array([i % step == 0 for i in range(len(tbl))])
    new = pc.if_else(mask, hot, arr)
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, tbl.schema.field(i), new)


def build_skewed(base: str, out: str, frac: float = 0.5) -> None:
    """Copy ``base`` with one hot KEY absorbing ~``frac`` of events
    (user_id), orders (o_custkey), and lineitem (l_orderkey), and one
    hot VALUE absorbing ~``frac`` of documents (text) and embeddings
    (embedding) — key-distribution and content-distribution stress in
    one fixture."""
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "events":
            pq.write_table(
                _skew_column(pq.read_table(src), "user_id", frac), dst
            )
        elif t == "orders":
            pq.write_table(
                _skew_column(pq.read_table(src), "o_custkey", frac), dst
            )
        elif t == "lineitem":
            tbl = _skew_column(pq.read_table(src), "l_orderkey", frac)
            pq.write_table(_renumber_hot_linenumbers(tbl, frac), dst)
        elif t == "documents":
            pq.write_table(
                _skew_content(pq.read_table(src), "text", frac), dst
            )
        elif t == "embeddings":
            pq.write_table(
                _skew_content(pq.read_table(src), "embedding", frac), dst
            )
        else:
            shutil.copyfile(src, dst)
    print(f"wrote skewed SF to {out}")


# --------------------------------------------------------------------------
# tie-storm + signed-zero/subnormal fixture (round 9)
# --------------------------------------------------------------------------
#
# The dirty catalog stresses VALUES, the skew catalog stresses KEY/CONTENT
# distribution; this one stresses ORDER-BY and MEASURE columns: ~frac of
# each table's ranking/measure column snapped to one constant, so every
# rank/row_number/percentile/top-k tie-break actually fires (tie-luck on
# clean data has hidden real bugs twice — round 7b's session-island scans
# and the round-8 NULL-ordering family both only surfaced once ties
# existed). Plus the IEEE corners the NaN/Inf dirty class doesn't reach:
# signed zeros (-0.0 stringifies differently from 0.0 in both engines'
# comparators) and subnormals (round(±1e-310, k) collapses to ±0.0), so a
# query emitting an un-normalized zero diverges between an engine that
# keeps the sign and one that drops it.


def _seed_special_doubles(tbl: pa.Table, col: str) -> pa.Table:
    """Plant signed zeros and subnormals at deterministic rows of a
    double column (non-null positions untouched otherwise)."""
    tbl = tbl.combine_chunks()
    vals = tbl[col].combine_chunks().to_pylist()
    specials = (-0.0, 0.0, 5e-324, -5e-324, 1e-310, -1e-310)
    n = len(vals)
    for j, v in enumerate(specials):
        pos = 17 * (j + 1)
        if pos < n:
            vals[pos] = v
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(
        i, tbl.schema.field(i), pa.array(vals, type=tbl.schema.field(i).type)
    )


def build_ties(base: str, out: str, frac: float = 0.4) -> None:
    """Copy ``base`` with tie storms on the ordering/measure columns —
    events.ts, orders.o_totalprice, lineitem.l_extendedprice/l_quantity,
    documents.n_chars snapped to their minimum for ~``frac`` of rows,
    ~30% of embeddings sharing one exact vector (distance ties at every
    top-k boundary) — plus signed-zero/subnormal seeds in the double
    measures (events.value, l_discount, l_tax)."""
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "events":
            tbl = _skew_column(pq.read_table(src), "ts", frac)
            pq.write_table(_seed_special_doubles(tbl, "value"), dst)
        elif t == "orders":
            pq.write_table(
                _skew_column(pq.read_table(src), "o_totalprice", frac), dst
            )
        elif t == "lineitem":
            tbl = _skew_column(pq.read_table(src), "l_extendedprice", frac)
            tbl = _skew_column(tbl, "l_quantity", frac)
            tbl = _seed_special_doubles(tbl, "l_discount")
            pq.write_table(_seed_special_doubles(tbl, "l_tax"), dst)
        elif t == "documents":
            pq.write_table(
                _skew_column(pq.read_table(src), "n_chars", frac), dst
            )
        elif t == "embeddings":
            pq.write_table(
                _skew_content(pq.read_table(src), "embedding", 0.3), dst
            )
        else:
            shutil.copyfile(src, dst)
    print(f"wrote tie-storm SF to {out}")


# --------------------------------------------------------------------------
# whole-table row-duplication fixture (round 10)
# --------------------------------------------------------------------------
#
# Every row of every table appears exactly `copies` times — the bulk
# double-load / replayed-ingest failure mode. Both engines see identical
# duplicated parquet, so divergence requires a query/oracle semantic gap
# that only full-row ties expose: an under-specified row_number pick
# between bit-identical rows is value-neutral, but anything keyed on
# physical row identity (monotonically_increasing_id leakage, first-wins
# aggregates over nondeterministic order) or asymmetric DISTINCT
# placement would surface here.


def build_duplicated(base: str, out: str, copies: int = 2) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(base, f"{t}.parquet"))
        pq.write_table(
            pa.concat_tables([tbl] * copies),
            os.path.join(out, f"{t}.parquet"),
        )
    print(f"wrote {copies}x row-duplicated SF to {out}")


def build_mixed_duplicated(base: str, out: str) -> None:
    """ASYMMETRIC multiplicities: every 5th fact row ×3, every 3rd
    orders/customer row ×2, two duplicated rows per code dim. The
    uniform 2× copy scales every aggregate by the same factor, which
    cancels in ratios and rank orders; uneven fan-out does not — the
    first run of this fixture caught the flagship star aggregate's raw
    double revenue sum splitting a cent at a round(,2) boundary on
    summation order (fixed via per-row DECIMAL(20,6) quantization)."""
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(base, f"{t}.parquet"))
        n = len(tbl)
        if t in ("lineitem", "events", "documents", "embeddings"):
            extra = tbl.take(list(range(0, n, 5)) * 2)
        elif t in ("orders", "customer"):
            extra = tbl.take(list(range(0, n, 3)))
        else:
            extra = tbl.take(list(range(0, min(2, n))))
        pq.write_table(
            pa.concat_tables([tbl, extra]), os.path.join(out, f"{t}.parquet")
        )
    print(f"wrote mixed-multiplicity duplicated SF to {out}")


# --------------------------------------------------------------------------
# locale / case-mapping fixture (round 10)
# --------------------------------------------------------------------------
#
# The round-6 dirty rows bait case-mapping in documents.text; this
# fixture targets the remaining casefold surfaces: the NAME columns that
# flow through upper()/length()/reverse() (supplier_codes), and the
# tokenizer stopword path `lower(tok).isin(...)` where Spark (Java
# Locale.ROOT full case mapping) and DuckDB (utf8proc simple mapping)
# genuinely disagree:
#   lower('İ')  = 'i̇' (i + U+0307) in Spark vs 'i' in DuckDB
#   upper('ß')  = 'SS' in Spark vs 'ẞ' in DuckDB
#   upper('ﬁ')  = 'FI' in Spark vs 'ﬁ' in DuckDB
#   reverse()   = codepoint-reverse in Spark vs grapheme-reverse in DuckDB
# The killer stopword bait is 'İN': DuckDB lowers it INTO the stopword
# list ('in'), Spark lowers it past ('i̇n').

_LOCALE_BASE = 20_000_000


def build_locale(base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        tbl = pq.read_table(src)
        if t == "documents":
            rows = [
                # Turkish dotted/dotless pairs + the İN stopword bait
                {"doc_id": _LOCALE_BASE + 0,
                 "text": "İN ıN IN in İstanbul ILIK ılık I ı İ i̇",
                 "lang": "tr", "source": "locale", "n_chars": 40},
                # sharp-s / ligature expansion bait (token-count-neutral)
                {"doc_id": _LOCALE_BASE + 1,
                 "text": "ß ẞ ﬁre ﬂour ﬃ STRAẞE straße oﬃce",
                 "lang": "de", "source": "locale", "n_chars": 36},
                # Greek final sigma both cased ways + fullwidth Latin
                {"doc_id": _LOCALE_BASE + 2,
                 "text": "ΟΔΥΣΣΕΥΣ οδυσσεύς ΑΣ ας Σ ς ＴＨＥ ｔｏ",
                 "lang": "el", "source": "locale", "n_chars": 36},
                # titlecase digraphs (initcap surface) + Kelvin/Angstrom
                # signs (NFKC-distinct lookalikes of K and Å)
                {"doc_id": _LOCALE_BASE + 3,
                 "text": "ǅevad ǄURO ǆuro K Å THE The the OF of",
                 "lang": "hr", "source": "locale", "n_chars": 37},
            ]
        elif t == "supplier":
            # names flow through upper()/length()/reverse(): sharp-s,
            # dotted-İ, ligature, final-sigma, and a combining-mark tail
            # (grapheme- vs codepoint-reverse bait)
            rows = [
                {"s_suppkey": _LOCALE_BASE + i, "s_name": n,
                 "s_nationkey": 1, "s_acctbal": 10.0 + i}
                for i, n in enumerate(
                    ["Straße ß Supply", "İstanbul ﬁrm", "ΟΔΥΣΣΕΥΣ ας",
                     "Supplier#i̇ẞe", "Naïve Co é"]
                )
            ]
        elif t == "customer":
            rows = [
                {"c_custkey": _LOCALE_BASE + i, "c_name": n,
                 "c_nationkey": 1, "c_acctbal": 50.0 + i,
                 "c_mktsegment": "BUILDING"}
                for i, n in enumerate(
                    ["Customer#ßİ", "Customer#ﬁﬂ", "Customer#Σς"]
                )
            ]
        elif t == "part":
            rows = [
                {"p_partkey": _LOCALE_BASE + i, "p_name": n,
                 "p_brand": "Brand#55", "p_type": "LOCALE BRUSHED TIN",
                 "p_size": 7, "p_retailprice": 900.0 + i}
                for i, n in enumerate(
                    ["straße ﬁtting ß", "İstanbul ǅig", "ΑΣ σﬁt"]
                )
            ]
        else:
            shutil.copyfile(src, dst)
            continue
        extra = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(pa.concat_tables([tbl, extra]), dst)
    print(f"wrote locale/case-mapping SF to {out}")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_dirty_sf"
    if len(sys.argv) > 3 and sys.argv[3] == "skew":
        build_skewed(base, out)
    elif len(sys.argv) > 3 and sys.argv[3] == "ties":
        build_ties(base, out)
    elif len(sys.argv) > 3 and sys.argv[3] == "dup":
        build_duplicated(base, out)
    elif len(sys.argv) > 3 and sys.argv[3] == "locale":
        build_locale(base, out)
    else:
        build(base, out)
