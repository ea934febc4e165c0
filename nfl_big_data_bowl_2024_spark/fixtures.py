"""Deterministic NFL-domain fixtures (FIXTURES.md §A scenarios).

The driver testdata has no tracking-shaped tables, so the domain pipelines
(E1 max-params, E2 YAP, E3 reporting) run over these fixtures. Every value is
generated from closed-form arithmetic (no RNG, no clock) so that:

  - the Spark query builds the input via ``createDataFrame`` and
  - the DuckDB oracle builds the IDENTICAL input via a VALUES CTE

and the two engines are compared on equal footing by the driver gate.

Scenario coverage (FIXTURES.md §A5):
  play 101  straight-line pursuit, playDirection=right, CB crosses R_t at
            frame 14 (gap 12 - 0.9*(f-1) yd), window = handoff@5 .. tackle@30
  play 102  never-in-vicinity (DE stays 5 yd away)          -> NULL maxima
  play 103  vicinity only BEFORE the start event            -> NULL maxima
  play 104  ball_snap fallback start (no handoff-class event)
  play 201  playDirection=left mirror of 101 (MLB)          -> same YAP
  play 202  multi-tackler play; the SECOND tackler (QB, unknown position)
            follows a known one (NT) -> the reference's method-scope limit
            variables are STALE-REUSED, not NameError'd
            (optimal_pursuit.py:458-477 if/elif has no else; vars persist
            across the tackler loop) -> computed row flagged
            'ok_stale_limits'
  play 203  no stop event -> identify_events raises -> error row (E1+E2)
  play 204  unknown-position tackler FIRST (no prior assignment) that
            enters the vicinity -> limits consumed while unset -> NameError
            -> play aborts (calculate_YAP.py:42-49 error row)
  play 205  unknown-position tackler first but NEVER in vicinity (NaN path
            never touches the limit vars) -> NaN row, loop CONTINUES to the
            known tackler behind it
  play 206  vicinity crossing exactly at the LAST frame -> E1 window
            [start, last) spans the whole run; YAP search unaffected by the
            boundary
  play 207  second playDirection=left geometry (slow closure, FS) -> sign
            convention exercised away from the exact mirror of 101
  play 301  CURVED pursuit: quadratic carrier arc + 2-D converging SS ->
            second hash-checked closed-form operating point for the LQR
            kernel (e2_yap_closed_form_curved), geometry genuinely 2-D
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

N_FRAMES = 35

PLAYERS = [
    (1001, "Carrier One", "RB"),
    (1002, "Carrier Two", "WR"),
    (2001, "Tackler Alpha", "CB"),
    (2002, "Tackler Bravo", "DE"),
    (2003, "Tackler Charlie", "MLB"),
    (2004, "Tackler Delta", "NT"),
    (2005, "Tackler Echo", "QB"),  # outside the limits table on purpose
    (2006, "Tackler Foxtrot", "FS"),
    (2007, "Tackler Golf", "SS"),  # curved-pursuit play 301
]

# (gameId, playId, ballCarrierId, playDirection)
PLAYS = [
    (1, 101, 1001, "right"),
    (1, 102, 1001, "right"),
    (1, 103, 1001, "right"),
    (1, 104, 1001, "right"),
    (2, 201, 1002, "left"),
    (2, 202, 1001, "right"),
    (2, 203, 1001, "right"),
    (3, 204, 1001, "right"),
    (3, 205, 1001, "right"),
    (3, 206, 1001, "right"),
    (3, 207, 1002, "left"),
    (4, 301, 1001, "right"),  # curved pursuit (quadratic carrier path)
]

TACKLES = [
    (1, 101, 2001),
    (1, 102, 2002),
    (1, 103, 2001),
    (1, 104, 2003),
    (2, 201, 2003),
    (2, 202, 2004),
    (2, 202, 2005),
    (2, 203, 2001),
    (3, 204, 2005),
    (3, 205, 2005),
    (3, 205, 2006),
    (3, 206, 2001),
    (3, 207, 2006),
    (4, 301, 2007),
]


def _carrier_row(game, play, nfl, f, direction, events):
    if direction == "right":
        x = 30.0 + 0.8 * (f - 1)
        dir_deg = 90.0
    else:
        x = 90.0 - 0.8 * (f - 1)
        dir_deg = 270.0
    return (
        game, play, nfl, f, round(0.1 * (f - 1), 1), events.get(f),
        round(x, 4), 26.65, 8.0, 0.5, dir_deg, direction,
    )


def _tackler_row(game, play, nfl, f, direction, gap_fn, s_fn, a_fn):
    if direction == "right":
        cx = 30.0 + 0.8 * (f - 1)
        x = cx + gap_fn(f)
        dir_deg = 270.0
    else:
        cx = 90.0 - 0.8 * (f - 1)
        x = cx - gap_fn(f)
        dir_deg = 90.0
    return (
        game, play, nfl, f, round(0.1 * (f - 1), 1), None,
        round(x, 4), 26.65, round(s_fn(f), 4), round(a_fn(f), 4), dir_deg, direction,
    )


def tracking_rows() -> list[tuple]:
    """Tracking fixture: (gameId, playId, nflId, frameId, t, event, x, y, s,
    a, dir, playDirection). 10 Hz; all participants share each play's frame
    set (the reference's positional-alignment assumption, SURVEY J4)."""
    rows: list[tuple] = []
    std_events = {5: "handoff", 30: "tackle"}

    def closing(f):  # crosses |gap| < 1.0 first at f=14 (gap 12-0.9*13 = 0.3)
        return 12.0 - 0.9 * (f - 1)

    def far(f):
        return 5.0

    def early_only(f):  # inside R_t only at frames 1-3, i.e. before start@5
        return 0.5 if f <= 3 else 6.0 + 0.2 * (f - 4)

    def last_frame(f):  # first |gap| < 1.0 exactly at the LAST frame (35)
        return 11.15 - 0.3 * (f - 1)

    def slow(f):  # crosses < 1.0 first at f=20 (12 - 0.58*19 = 0.98)
        return 12.0 - 0.58 * (f - 1)

    def s_ramp(f):  # max over window [5,14) is at f=13 -> 6.3
        return 5.0 + 0.1 * f if f <= 20 else 7.0 - 0.05 * (f - 20)

    def a_decay(f):  # max over window [5,14) is at f=5 -> 2.75
        return 3.0 - 0.05 * f

    # play 301: CURVED pursuit — the carrier bends upfield on a quadratic
    # arc (x linear, y quadratic) while the SS converges along both axes,
    # so neither the vicinity distance nor the LQR boundary conditions
    # reduce to the 1-D geometry of plays 101/201. The closed-form facts
    # (vicinity crossing at frame 14, first LQR-feasible intercept at
    # start+5, YAP = 2.8) are re-derived with margins in
    # tests/test_yap_kernel.py::test_closed_form_operating_point_curved.
    def _curved_play_rows(game: int, play: int, carrier: int, tackler: int):
        out = []
        events = {5: "handoff", 30: "tackle"}
        for f in range(1, N_FRAMES + 1):
            x_c = round(30.0 + 0.7 * (f - 1), 4)
            y_c = round(26.65 + 0.012 * (f - 1) ** 2, 4)
            out.append((game, play, carrier, f, round(0.1 * (f - 1), 1),
                        events.get(f), x_c, y_c, 8.0, 0.5, 90.0, "right"))
        for f in range(1, N_FRAMES + 1):
            x_c = 30.0 + 0.7 * (f - 1)
            y_c = 26.65 + 0.012 * (f - 1) ** 2
            # 2-D convergence: dist < 1.0 first at f=14
            x_t = round(x_c + 8.0 - 0.55 * (f - 1), 4)
            y_t = round(y_c + 4.0 - 0.28 * (f - 1), 4)
            s = 5.0 + 0.1 * f if f <= 20 else 7.0 - 0.05 * (f - 20)
            a = 3.0 - 0.05 * f
            out.append((game, play, tackler, f, round(0.1 * (f - 1), 1),
                        None, x_t, y_t, round(s, 4), round(a, 4), 250.0,
                        "right"))
        return out

    for game, play, carrier, direction in PLAYS:
        if play == 301:
            rows.extend(_curved_play_rows(game, play, carrier, 2007))
            continue
        if play == 104:
            events = {3: "ball_snap", 30: "out_of_bounds"}
        elif play == 203:
            events = {5: "handoff"}  # no stop event -> error row
        else:
            events = std_events
        for f in range(1, N_FRAMES + 1):
            rows.append(_carrier_row(game, play, carrier, f, direction, events))
        for tg, tp, tackler in TACKLES:
            if (tg, tp) != (game, play):
                continue
            if play == 102:
                gap = far
            elif play == 103:
                gap = early_only
            elif play == 205 and tackler == 2005:
                gap = far  # the unknown-position tackler stays clear
            elif play == 206:
                gap = last_frame
            elif play == 207:
                gap = slow
            else:
                gap = closing
            for f in range(1, N_FRAMES + 1):
                rows.append(
                    _tackler_row(game, play, tackler, f, direction, gap, s_ramp, a_decay)
                )
    return rows


TRACKING_FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("gameId", T.LongType(), False),
        T.StructField("playId", T.LongType(), False),
        T.StructField("nflId", T.LongType(), False),
        T.StructField("frameId", T.IntegerType(), False),
        T.StructField("t", T.DoubleType(), False),
        T.StructField("event", T.StringType(), True),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
        T.StructField("s", T.DoubleType(), False),
        T.StructField("a", T.DoubleType(), False),
        T.StructField("dir", T.DoubleType(), False),
        T.StructField("playDirection", T.StringType(), False),
    ]
)

PLAYERS_FIXTURE_SCHEMA = "nflId long, displayName string, position string"
PLAYS_FIXTURE_SCHEMA = "gameId long, playId long, ballCarrierId long, playDirection string"
TACKLES_FIXTURE_SCHEMA = "gameId long, playId long, nflId long"


def _local_df(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """JVM-local fixture relation via an Arrow table (r14 optimization).

    The tuple path (``createDataFrame(list_of_tuples)``) parks rows in a
    pickled RDD whose every evaluation pays a Python round trip (1.7-3 s
    for the 910-row tracking fixture) — the dominant fixed cost of every
    fixture-fed query. The Arrow path is a pure-JVM ``LocalTableScan``
    with bit-identical values; see ``localrel.local_df``."""
    from .localrel import local_df

    return local_df(spark, rows, schema)


def tracking_df(spark: SparkSession) -> DataFrame:
    return _local_df(spark, tracking_rows(), TRACKING_FIXTURE_SCHEMA)


def players_df(spark: SparkSession) -> DataFrame:
    return _local_df(spark, PLAYERS, PLAYERS_FIXTURE_SCHEMA)


def plays_df(spark: SparkSession) -> DataFrame:
    return _local_df(spark, PLAYS, PLAYS_FIXTURE_SCHEMA)


def tackles_df(spark: SparkSession) -> DataFrame:
    return _local_df(spark, TACKLES, TACKLES_FIXTURE_SCHEMA)


def _sql_lit(v) -> str:
    # Explicit casts: DuckDB types bare VALUES literals as DECIMAL/INT32,
    # which would leak into aggregates (max of DECIMAL renders '6.30') and
    # diverge from Spark's DOUBLE/BIGINT fixture schema.
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    return f"CAST({v} AS BIGINT)"


def values_cte(rows: list[tuple], cols: list[str]) -> str:
    """Render rows as a DuckDB VALUES relation body: (...), (...) AS t(cols)."""
    body = ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    return f"(VALUES\n{body}\n) AS fx({', '.join(cols)})"


TRACKING_COLS = [
    "gameId", "playId", "nflId", "frameId", "t", "event",
    "x", "y", "s", "a", "dir", "playDirection",
]


def tracking_values_cte() -> str:
    return values_cte(tracking_rows(), TRACKING_COLS)


def players_values_cte() -> str:
    return values_cte(PLAYERS, ["nflId", "displayName", "position"])


def plays_values_cte() -> str:
    return values_cte(PLAYS, ["gameId", "playId", "ballCarrierId", "playDirection"])


def tackles_values_cte() -> str:
    return values_cte(TACKLES, ["gameId", "playId", "nflId"])


# ---------------------------------------------------------------------------
# Parameterized synthetic play generator: the 7-scenario fixture above checks
# SEMANTICS; this generates n plays of plausible pursuit geometry so the E2
# kernel can be load-tested / benched at any scale (plays are the unit of
# parallelism at 100 TB — ~12k in the reference season).
# ---------------------------------------------------------------------------


def _synthetic_play_meta(p: int) -> tuple[list, tuple, list]:
    """(players, play, tackles) dimension rows for synthetic play ``p``."""
    positions = ["CB", "DE", "MLB", "NT", "FS", "OLB"]
    game = 100 + p // 50
    play = 10_000 + p
    carrier = 50_000 + p
    t1, t2 = 60_000 + 2 * p, 60_001 + 2 * p
    direction = "right" if p % 2 == 0 else "left"
    players = [
        (carrier, f"Carrier {p}", "RB"),
        (t1, f"Tackler {2*p}", positions[p % len(positions)]),
        (t2, f"Tackler {2*p+1}", positions[(p + 3) % len(positions)]),
    ]
    return players, (game, play, carrier, direction), [(game, play, t1), (game, play, t2)]


def _synthetic_play_tracking(p: int) -> list[tuple]:
    """Tracking rows for synthetic play ``p`` (closed-form pursuit geometry,
    deterministic trig-free arithmetic, no RNG)."""
    game = 100 + p // 50
    play = 10_000 + p
    carrier = 50_000 + p
    t1, t2 = 60_000 + 2 * p, 60_001 + 2 * p
    direction = "right" if p % 2 == 0 else "left"
    events = {5: "handoff", 32: "tackle"}
    speed = 6.0 + (p % 5) * 0.5          # carrier speed varies per play
    gap0 = 8.0 + (p % 7)                 # initial separation varies
    close = 0.7 + 0.05 * (p % 4)         # closing rate per frame
    rows: list[tuple] = []
    for f in range(1, N_FRAMES + 1):
        step = speed * 0.1
        if direction == "right":
            cx = 25.0 + step * (f - 1)
            cdir = 90.0
        else:
            cx = 95.0 - step * (f - 1)
            cdir = 270.0
        rows.append((game, play, carrier, f, round(0.1 * (f - 1), 1),
                     events.get(f), round(cx, 4), 26.65, speed, 0.5,
                     cdir, direction))
        for k, tackler in enumerate((t1, t2)):
            gap = gap0 + 2.0 * k - close * (f - 1)
            tx = cx + gap if direction == "right" else cx - gap
            tdir = 270.0 if direction == "right" else 90.0
            rows.append((game, play, tackler, f, round(0.1 * (f - 1), 1),
                         None, round(tx, 4), 26.65,
                         round(4.0 + 0.08 * f, 4), round(2.5 - 0.03 * f, 4),
                         tdir, direction))
    return rows


def synthetic_plays(n_plays: int) -> tuple[list, list, list, list]:
    """(tracking_rows, players, plays, tackles) for n_plays closed-form
    pursuit plays, one carrier + two tacklers each, varying speeds/gaps."""
    players: list[tuple] = []
    plays: list[tuple] = []
    tackles: list[tuple] = []
    rows: list[tuple] = []
    for p in range(n_plays):
        pl, play, tk = _synthetic_play_meta(p)
        players.extend(pl)
        plays.append(play)
        tackles.extend(tk)
        rows.extend(_synthetic_play_tracking(p))
    return rows, players, plays, tackles


def synthetic_tracking_df(spark, n_plays: int):
    """Distributed twin of ``synthetic_plays``' tracking table: the frame
    rows are generated INSIDE a ``mapInPandas`` over the play-id range
    instead of being built and Arrow-serialized on the driver. Identical
    rows (asserted in tests); at season scale (~12k plays, ~1.4M rows/week
    in the reference) driver-side generation would be the bottleneck —
    executors generating their own partitions is the 100 TB shape.
    """
    import pandas as pd

    cols = TRACKING_COLS

    def gen(it):
        for pdf in it:
            rows: list[tuple] = []
            for p in pdf["id"]:
                rows.extend(_synthetic_play_tracking(int(p)))
            yield pd.DataFrame(rows, columns=cols)

    sc = spark.sparkContext
    return (
        spark.range(n_plays)
        .repartition(sc.defaultParallelism)
        .mapInPandas(gen, TRACKING_FIXTURE_SCHEMA)
    )


def synthetic_play_count(sf_dir: str) -> int:
    """Scale the synthetic E2 workload with the harness scale factor."""
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.01
    return max(8, min(256, int(sf * 2560)))


# ---------------------------------------------------------------------------
# Stage-2 result fixture (FIXTURES.md §A6) for the E3 reporting chain:
# deterministic pseudo-results spanning all positions, repeated NFL_IDs,
# negative YAPs (clip test) and NULLs (never-in-vicinity analog).
# ---------------------------------------------------------------------------

_POSITIONS = ["CB", "FS", "SS", "DB", "DE", "MLB", "OLB", "ILB", "DT", "NT"]


def stage2_rows() -> list[tuple]:
    """(game_ID, play_ID, NFL_ID, name, position, YAP, max_vel, max_accel,
    max_vel_opt, max_accel_opt) — 120 rows, closed-form pseudo-values."""
    rows = []
    for i in range(120):
        nfl = 3000 + (i % 12)  # 12 players, 10 rows each
        pos = _POSITIONS[nfl % len(_POSITIONS)]
        game = 100 + i // 30
        play = 1000 + i
        # triangle-wave pseudo-values; a few negatives and NULLs
        yap = round(((i * 7) % 23) - 3.0, 2)  # range [-3, 19]
        if i % 17 == 0:
            yap = None  # NaN-analog: never feasible
        mv = round(4.0 + (i % 9) * 0.5, 2)
        ma = round(2.0 + (i % 7) * 0.4, 2)
        rows.append(
            (game, play, nfl, f"Player {nfl}", pos, yap, mv, ma,
             round(mv + 0.3, 2), round(ma + 0.2, 2))
        )
    return rows


STAGE2_COLS = [
    "game_ID", "play_ID", "NFL_ID", "name", "position",
    "YAP", "max_vel", "max_accel", "max_vel_opt", "max_accel_opt",
]

STAGE2_SCHEMA = T.StructType(
    [
        T.StructField("game_ID", T.LongType(), False),
        T.StructField("play_ID", T.LongType(), False),
        T.StructField("NFL_ID", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("position", T.StringType(), False),
        T.StructField("YAP", T.DoubleType(), True),
        T.StructField("max_vel", T.DoubleType(), False),
        T.StructField("max_accel", T.DoubleType(), False),
        T.StructField("max_vel_opt", T.DoubleType(), False),
        T.StructField("max_accel_opt", T.DoubleType(), False),
    ]
)


def stage2_df(spark: SparkSession) -> DataFrame:
    return _local_df(spark, stage2_rows(), STAGE2_SCHEMA)


def stage2_values_cte() -> str:
    return values_cte(stage2_rows(), STAGE2_COLS)
