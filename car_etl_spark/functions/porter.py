"""Porter stemmer (1980), tri-compiled: literal Python, Spark Columns,
DuckDB SQL — all from one rule table.

The reference's keyword search stems via PostgreSQL's ``english``
tsvector configuration (``supabase/migrations/044_keyword_search.sql:
22-34``), whose stemmer is Snowball/Porter.  The repo's declared
3-rule suffix stemmer (:mod:`car_etl_spark.functions.text`) was the
minimal stand-in; this module is the real algorithm, as published in
M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980
(public knowledge).

Three backends, one source of truth:

- :func:`porter_py` — a LITERAL implementation of the algorithm
  (``cons``/``m``/``vowelinstem``/``doublec``/``cvc`` exactly as the
  paper defines them, including the contextual 'y').  This is the
  ground truth the other two backends are property-tested against,
  and the driver-side query-term stemmer (no Spark job to stem a
  query).
- :func:`with_porter` — Spark: the five steps compiled to chained
  ``F.when`` / ``rlike`` / ``regexp_replace`` Column expressions,
  STAGED one column per step (``select``-pipelined).  Staging matters:
  each step references its input many times (condition + rewrite per
  rule), so inlining step N's tree into step N+1 would blow up
  exponentially; a named column per step keeps every reference O(1).
  All JVM-side, whole-stage-codegen friendly, no UDF.
- :func:`porter_sql_stages` — DuckDB: the same steps as SQL CASE
  expressions, staged through nested subqueries by the caller (the
  oracle twin of the Spark plan).

Regex condition encoding (shared by the Spark and SQL backends):
Porter's measure/shape conditions become existence regexes over the
token with the candidate suffix anchored at the end — ``m(stem) > 0``
is "stem contains a vowel→consonant transition", ``m > 1`` two
disjoint ones, ``*v*`` "stem contains a vowel", ``*o`` "stem ends
consonant-vowel-consonant, last not w/x/y".  The contextual 'y'
(vowel iff preceded by a consonant) is encoded in the alternations,
and NON-LETTER characters (apostrophes, hyphens — tokens are
whitespace-split, never letter-filtered) behave as consonants exactly
like the literal backend's ``cons()`` default: patterns traverse with
``\\S``, not ``\\w``, and the doubled-consonant test compares the two
final characters instead of enumerating letter pairs.  The one
approximation is runs of 3+ consecutive 'y's in artificial tokens (no
English word has them), where classification can diverge from the
literal backend — the equivalence tests pin exactness over the real
corpus vocabulary plus randomized tokens with up to double-y runs and
punctuation-bearing alphabets.  Patterns use no lookarounds and no
backreferences, so Java regex (Spark) and RE2 (DuckDB) agree by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Literal implementation (ground truth; driver-side query stemming)


def _cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in "aeiou":
        return False
    if ch == "y":
        return True if i == 0 else not _cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m: number of vowel-sequence -> consonant-sequence transitions."""
    n, i, m = len(stem), 0, 0
    while i < n and _cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _cons(stem, i):
            i += 1
        if i == n:
            break
        m += 1
        while i < n and _cons(stem, i):
            i += 1
    return m


def _vowel_in_stem(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _doublec(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _cons(word, len(word) - 1)


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    n = len(word)
    if not (_cons(word, n - 1) and not _cons(word, n - 2) and _cons(word, n - 3)):
        return False
    return word[-1] not in "wxy"


def _ends(word: str, suffix: str) -> bool:
    return word.endswith(suffix) and len(word) > len(suffix)


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_match(word: str, suffixes) -> str | None:
    best = None
    for s in suffixes:
        if _ends(word, s) and (best is None or len(s) > len(best)):
            best = s
    return best


def porter_py(word: str) -> str:
    """The Porter (1980) stem of a lowercase token — literal algorithm."""
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s") and len(w) > 1:
        w = w[:-1]

    # step 1b — eed is the longest match even with an empty stem
    # ("eed" itself): its failed m>0 condition still consumes the step
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        fired = False
        if _ends(w, "ed") and _vowel_in_stem(w[:-2]):
            w, fired = w[:-2], True
        elif _ends(w, "ing") and _vowel_in_stem(w[:-3]):
            w, fired = w[:-3], True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _doublec(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # step 1c
    if _ends(w, "y") and _vowel_in_stem(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    m = _longest_match(w, [s for s, _ in _STEP2])
    if m is not None and _measure(w[: -len(m)]) > 0:
        w = w[: -len(m)] + dict(_STEP2)[m]

    # step 3
    m = _longest_match(w, [s for s, _ in _STEP3])
    if m is not None and _measure(w[: -len(m)]) > 0:
        w = w[: -len(m)] + dict(_STEP3)[m]

    # step 4
    m = _longest_match(w, _STEP4)
    if m is not None:
        stem = w[: -len(m)]
        if _measure(stem) > 1 and (m != "ion" or stem[-1:] in ("s", "t")):
            w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        mm = _measure(stem)
        if mm > 1 or (mm == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _doublec(w) and w.endswith("l"):
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# Shared regex condition fragments (Java regex == RE2 subset: no
# lookarounds, no backreferences)

#: one vowel->consonant transition (any non-aeiou letter AFTER a vowel
#: is a consonant, including y; a y after a non-vowel non-y letter is a
#: vowel, and any following non-aeiou letter is then a consonant)
_VTRANS = "(?:[aeiou][^aeiou]|[^aeiouy]y[^aeiou])"
#: the same, valid only anchored at token start: word-initial y is a
#: consonant, so in "yyX" the second y is a vowel
_VTRANS_HEAD = "yy[^aeiou]"


def _pat_m_gt0(suffix: str) -> str:
    return rf"^(?:\S*?{_VTRANS}\S*?|{_VTRANS_HEAD}\S*?){suffix}$"


#: a SECOND transition following an earlier one: either self-contained
#: (with its own left context), or the adjacent borrowed-context form
#: ``y[^aeiou]`` — every _VTRANS alternative ends in a consonant, so a
#: 'y' immediately after it is a vowel and the next non-aeiou letter a
#: consonant ("aonyyoer": transitions o→n and y→y share the 'n')
_VTRANS_NEXT = rf"(?:\S*?{_VTRANS}|y[^aeiou])"


def _pat_m_gt1(suffix: str) -> str:
    return (
        rf"^(?:\S*?{_VTRANS}{_VTRANS_NEXT}\S*?"
        rf"|{_VTRANS_HEAD}{_VTRANS_NEXT}\S*?){suffix}$"
    )


def _pat_has_vowel(suffix: str) -> str:
    return rf"^(?:\S*?(?:[aeiou]|[^aeiou]y)\S*?|yy\S*?){suffix}$"


def _pat_ends_cvc(suffix: str) -> str:
    """Stem ends consonant-vowel-consonant, final consonant not w/x/y.
    Alternatives cover: plain-consonant C; word-initial or post-vowel
    'y' as the leading C; 'y' (post-consonant) as the middle vowel."""
    last_c = "[^aeiouwxy]"
    alts = [
        rf"\S*?[^aeiouy][aeiou]{last_c}",      # CVC, leading C not y
        rf"y[aeiou]{last_c}",                  # ^yVC (initial y is C)
        rf"\S*?[aeiou]y[aeiou]{last_c}",       # VyVC (post-vowel y is C)
        rf"\S*?[^aeiouy]y{last_c}",            # CyC (post-consonant y is V;
        #                                        context restricted to true
        #                                        consonants — a y there could
        #                                        itself be a vowel, making
        #                                        the middle y a consonant)
        rf"yy{last_c}",                        # ^yyC (initial y is C, next V)
        rf"\S*?[aeiou]yy{last_c}",             # VyyC (post-vowel y is C, next V)
    ]
    return rf"^(?:{'|'.join(alts)}){suffix}$"


def _double_not_lsz(b, x):
    """*d minus l/s/z (step 1b fixup): last two chars equal and the
    last a consonant (porter.c doublec — ANY non-vowel char counts,
    including punctuation, cons() defaults true).  Expressed as a
    character-equality test rather than an enumerated pair regex so
    doubled non-letters ("''", "--") behave like the literal backend.
    The y case is contextual: "Cyy" doubles (first y vowel, second
    consonant), "ayy"/"^yy" do not — kept as the dedicated pattern."""
    plain = b.and_(
        b.length_gt(x, 1),
        b.and_(
            b.eq(b.last(x, 1), b.last(x, 2)),
            b.not_(b.rlike(b.last(x, 1), "^[aeioulszy]$")),
        ),
    )
    return b.or_(plain, b.rlike(x, "[^aeiouy]yy$"))
#: doubled l for step 5b
_PAT_DOUBLE_L = "ll$"


# ---------------------------------------------------------------------------
# Backend builders.  Each step is compiled as a function of ONE input
# expression which it may reference many times — callers stage steps
# through named columns / subquery aliases so references stay O(1).


class _SparkB:
    """Spark Column backend."""

    def rlike(self, x: Column, pat: str) -> Column:
        return x.rlike(pat)

    def replace(self, x: Column, suffix: str, repl: str) -> Column:
        return F.regexp_replace(x, suffix + "$", repl)

    def chop(self, x: Column) -> Column:
        return x.substr(F.lit(1), F.length(x) - 1)

    def append(self, x: Column, s: str) -> Column:
        return F.concat(x, F.lit(s))

    def when_chain(self, branches, otherwise):
        expr = None
        for cond, val in branches:
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        return expr.otherwise(otherwise) if expr is not None else otherwise

    def and_(self, a, b):
        return a & b

    def or_(self, a, b):
        return a | b

    def not_(self, a):
        return ~a

    def length_gt(self, x: Column, n: int) -> Column:
        return F.length(x) > n

    def eq(self, a, b):
        return a == b

    def last(self, x: Column, n_from_end: int) -> Column:
        """The single character n_from_end positions from the end (1 =
        final char)."""
        return x.substr(F.length(x) - F.lit(n_from_end - 1), F.lit(1))


class _SqlB:
    """DuckDB SQL-string backend (same shapes, same patterns)."""

    def rlike(self, x: str, pat: str) -> str:
        return f"regexp_matches({x}, '{pat}')"

    def replace(self, x: str, suffix: str, repl: str) -> str:
        return f"regexp_replace({x}, '{suffix}$', '{repl}')"

    def chop(self, x: str) -> str:
        return f"substring({x}, 1, length({x}) - 1)"

    def append(self, x: str, s: str) -> str:
        return f"({x} || '{s}')"

    def when_chain(self, branches, otherwise):
        parts = [f"WHEN {c} THEN {v}" for c, v in branches]
        return "(CASE " + " ".join(parts) + f" ELSE {otherwise} END)"

    def and_(self, a, b):
        return f"({a} AND {b})"

    def or_(self, a, b):
        return f"({a} OR {b})"

    def not_(self, a):
        return f"(NOT {a})"

    def length_gt(self, x: str, n: int) -> str:
        return f"(length({x}) > {n})"

    def eq(self, a: str, b: str) -> str:
        return f"({a} = {b})"

    def last(self, x: str, n_from_end: int) -> str:
        return f"substring({x}, length({x}) - {n_from_end - 1}, 1)"


def _suffix_rule_steps(b, x):
    """Compile steps 1a, 1c, 2, 3, 4 generically; 1b, 5a, 5b are
    special-cased.  Returns dict step-name -> expression."""
    out = {}

    # -- step 1a: longest of sses/ies/ss/s --------------------------------
    out["1a"] = b.when_chain(
        [
            (b.rlike(x, "sses$"), b.replace(x, "sses", "ss")),
            (b.rlike(x, "ies$"), b.replace(x, "ies", "i")),
            (b.rlike(x, "ss$"), x),
            (b.rlike(x, "\\Ss$"), b.replace(x, "s", "")),
        ],
        x,
    )

    # -- step 1c: (*v*) y -> i -------------------------------------------
    out["1c"] = b.when_chain(
        [
            (
                b.and_(b.rlike(x, "\\Sy$"), b.rlike(x, _pat_has_vowel("y"))),
                b.replace(x, "y", "i"),
            )
        ],
        x,
    )

    # -- steps 2 & 3: (m>0) suffix maps, longest-match-first --------------
    for name, rules in (("2", _STEP2), ("3", _STEP3)):
        ordered = sorted(rules, key=lambda r: -len(r[0]))
        branches = []
        for suffix, repl in ordered:
            fire = b.and_(
                b.rlike(x, rf"\S{suffix}$"), b.rlike(x, _pat_m_gt0(suffix))
            )
            # longest-match gate: if the suffix matches but m fails, the
            # step must do NOTHING — a bare ends-with branch keeping x
            # catches that before any shorter suffix can fire
            branches.append((fire, b.replace(x, suffix, repl)))
            branches.append((b.rlike(x, rf"\S{suffix}$"), x))
        out[name] = b.when_chain(branches, x)

    # -- step 4: (m>1) deletions; ion needs stem ending s/t ---------------
    branches = []
    for suffix in sorted(_STEP4, key=len, reverse=True):
        if suffix == "ion":
            # stem must end s/t AND have m>1.  These compose as separate
            # tests: folding [st] into the m>1 pattern would be wrong —
            # a transition may END on the s/t itself ("decis" counts
            # i->s as its second transition)
            fire = b.and_(
                b.rlike(x, r"[st]ion$"),
                b.rlike(x, _pat_m_gt1(suffix)),
            )
        else:
            fire = b.and_(
                b.rlike(x, rf"\S{suffix}$"), b.rlike(x, _pat_m_gt1(suffix))
            )
        branches.append((fire, b.replace(x, suffix, "")))
        branches.append((b.rlike(x, rf"\S{suffix}$"), x))
    out["4"] = b.when_chain(branches, x)

    return out


def _step_1b(b, x):
    """(m>0) eed->ee | (*v*) ed/ing -> '' + fixups."""

    def fixup(chopped):
        # chopped = x minus ed/ing; apply at/bl/iz -> +e, undouble,
        # (m=1 and *o) -> +e
        m1 = b.and_(
            b.rlike(chopped, _pat_m_gt0("")),
            b.not_(b.rlike(chopped, _pat_m_gt1(""))),
        )
        return b.when_chain(
            [
                (b.rlike(chopped, "(?:at|bl|iz)$"), b.append(chopped, "e")),
                (_double_not_lsz(b, chopped), b.chop(chopped)),
                (
                    b.and_(m1, b.rlike(chopped, _pat_ends_cvc(""))),
                    b.append(chopped, "e"),
                ),
            ],
            chopped,
        )

    return b.when_chain(
        [
            # longest match first: eed (condition m>0, else unchanged —
            # and crucially ed/ing must NOT then fire)
            (
                b.and_(b.rlike(x, "\\Seed$"), b.rlike(x, _pat_m_gt0("eed"))),
                b.replace(x, "eed", "ee"),
            ),
            (b.rlike(x, "eed$"), x),
            (
                b.and_(b.rlike(x, "\\Sed$"), b.rlike(x, _pat_has_vowel("ed"))),
                fixup(b.replace(x, "ed", "")),
            ),
            (
                b.and_(b.rlike(x, "\\Sing$"), b.rlike(x, _pat_has_vowel("ing"))),
                fixup(b.replace(x, "ing", "")),
            ),
        ],
        x,
    )


def _step_5(b, x):
    """5a: (m>1) e->'' | (m=1 and not *o) e->''; 5b: (m>1, *d, *L) undouble."""
    stem = b.replace(x, "e", "")
    m_eq1 = b.and_(
        b.rlike(x, _pat_m_gt0("e")), b.not_(b.rlike(x, _pat_m_gt1("e")))
    )
    drop_e = b.when_chain(
        [
            (
                b.and_(
                    b.rlike(x, "\\Se$"),
                    b.and_(
                        b.rlike(x, _pat_m_gt0("e")),  # m >= 1
                        b.not_(
                            b.and_(
                                m_eq1, b.rlike(x, _pat_ends_cvc("e"))
                            )
                        ),
                    ),
                ),
                stem,
            )
        ],
        x,
    )
    # 5b on the 5a result — staged by the caller, so receive it fresh
    return drop_e


def _step_5b(b, x):
    return b.when_chain(
        [
            (
                b.and_(
                    b.rlike(x, _PAT_DOUBLE_L), b.rlike(x, _pat_m_gt1("l"))
                ),
                b.chop(x),
            )
        ],
        x,
    )


#: step order; each entry is compiled against the PREVIOUS step's
#: staged output column
_STEP_ORDER = ("1a", "1b", "1c", "2", "3", "4", "5a", "5b")


def _compile_step(b, name: str, x):
    if name == "1b":
        return _step_1b(b, x)
    if name == "5a":
        return _step_5(b, x)
    if name == "5b":
        return _step_5b(b, x)
    return _suffix_rule_steps(b, x)[name]


def _guard(b, tok, stemmed):
    """Words of length <= 2 are returned unchanged (porter.c:stem)."""
    return b.when_chain([(b.length_gt(tok, 2), stemmed)], tok)


def with_porter(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Add ``dst`` = Porter stem of lowercase token column ``src``,
    staging one column per step (8 pipelined selects, all codegen)."""
    b = _SparkB()
    cur = src
    for i, name in enumerate(_STEP_ORDER):
        nxt = f"__porter_{i}"
        df = df.withColumn(nxt, _compile_step(b, name, F.col(cur)))
        cur = nxt
    out = _guard(b, F.col(src), F.col(cur))
    return df.withColumn(dst, out).drop(
        *[f"__porter_{i}" for i in range(len(_STEP_ORDER))]
    )


def porter_sql_stages(src: str) -> list[tuple[str, str]]:
    """DuckDB twin: ordered (column_name, sql_expr) stages.  Feed each
    stage's expr through a subquery/CTE that aliases it to the column
    name, then reference that name in the next stage — e.g.::

        SELECT *, <expr0> AS __porter_0 FROM t
        ... SELECT *, <expr7> AS __porter_7 ...

    and finish with ``porter_sql_guard(src, '__porter_7')``."""
    b = _SqlB()
    stages = []
    cur = src
    for i, name in enumerate(_STEP_ORDER):
        nxt = f"__porter_{i}"
        stages.append((nxt, _compile_step(b, name, cur)))
        cur = nxt
    return stages


def porter_sql_guard(src: str, last_stage: str) -> str:
    b = _SqlB()
    return _guard(b, src, last_stage)
