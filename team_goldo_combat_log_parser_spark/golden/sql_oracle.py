"""The combat-log parser re-derived in pure SQL (DuckDB dialect).

``combat_oracle_queries(corpus)`` returns, for each combat aggregate, a
self-contained DuckDB SQL string that embeds the corpus lines as VALUES
and re-implements the full reference semantics — csv field split, amount
grammar, fight pairing, duplicate-pull suppression, the ignore-pull gate,
healer as-of attribution, mitigation precedence — using only SQL window
functions and correlated subqueries. This is an independent re-derivation
(not golden constants), so the driver's value-hash comparison checks the
Spark pipeline against a second engine end-to-end.

One simplification relative to the sequential oracle: fight pairing
assumes marker rows are well-formed (no EnterCombat while already in
combat, no stray player-targeted Exit/Death between fights) — true of the
generated corpora; the general case is covered by tests/test_e2e_oracle.py
against the sequential oracle.
"""

from __future__ import annotations

from .. import constants as C

BIG = 4611686018427387904  # open-fight sentinel (2^62)


def _values(corpus: list[tuple[str, list[str]]]) -> str:
    rows = []
    for fname, lines in corpus:
        log_id = fname.rsplit(".", 1)[0]
        date = fname.split("_", 2)[1]
        for i, line in enumerate(lines):
            esc = line.replace("'", "''")
            rows.append(f"('{log_id}', {i}, '{date}', '{esc}')")
    return ",\n    ".join(rows)


def _base_ctes(corpus: list[tuple[str, list[str]]]) -> str:
    """Shared CTE chain: raw lines -> typed events -> fights -> routed."""
    return f"""
WITH raw(log_id, line_no, log_date, line) AS (VALUES
    {_values(corpus)}
),
sp AS (SELECT *, string_split(line, ']') AS p FROM raw),
f AS (
  SELECT log_id, line_no, log_date,
         coalesce(p[1], '') AS time_raw,
         ltrim(coalesce(p[2], ''), ' ') AS src_raw,
         ltrim(coalesce(p[3], ''), ' ') AS tgt_raw,
         ltrim(coalesce(p[4], ''), ' ') AS skill_raw,
         ltrim(coalesce(p[5], ''), ' ') AS effect_raw,
         ltrim(coalesce(p[6], ''), ' ') AS amount_raw
  FROM sp
),
typed AS (
  SELECT *,
    strptime(log_date || ' ' || substring(time_raw, 2),
             '%Y-%m-%d %H:%M:%S.%g') AS ts,
    (string_split(substring(src_raw, 2), '{{'))[1] AS src_name,
    substring(src_raw, 3) AS src_player,
    (string_split(substring(tgt_raw, 2), '{{'))[1] AS tgt_name,
    (string_split(substring(skill_raw, 2), '{{'))[1] AS skill,
    TRY_CAST(NULLIF(regexp_extract(skill_raw, '\\{{([0-9]+)\\}}', 1), '')
             AS BIGINT) AS spell_id,
    TRY_CAST(NULLIF(regexp_extract(amount_raw, '^\\(([0-9]+)', 1), '')
             AS BIGINT) AS amount,
    regexp_extract(amount_raw, '^\\(\\S+\\s+(\\S+)', 1) AS dmg_type,
    TRY_CAST(NULLIF(regexp_extract(amount_raw, '^\\(([^(]*)\\(([0-9]+)', 2), '')
             AS BIGINT) AS absorbed,
    TRY_CAST(NULLIF(regexp_extract(amount_raw, '<([^>]*)>', 1), '')
             AS BIGINT) AS threat,
    position('<' IN amount_raw) > 0 AS has_threat,
    position('{C.ENTER_COMBAT}' IN effect_raw) > 0 AS is_enter,
    position('{C.LEAVE_COMBAT}' IN effect_raw) > 0 AS is_leave,
    position('{C.DEATH}' IN effect_raw) > 0 AS is_death,
    position('{C.DAMAGE}' IN effect_raw) > 0 AS is_damage,
    position('{C.HEAL}' IN effect_raw) > 0 AS is_heal_eff,
    position('{C.FORCE_ARMOR}' IN effect_raw) > 0 AS is_fa,
    position('{C.MISS}' IN amount_raw) > 0 AS m_miss,
    position('{C.ABSORB}' IN amount_raw) > 0 AS m_absorb,
    position('{C.RESIST}' IN amount_raw) > 0 AS m_resist,
    (position('{C.DODGE}' IN amount_raw) > 0
     OR position('{C.PARRY}' IN amount_raw) > 0
     OR position('{C.DEFLECT}' IN amount_raw) > 0) AS m_dodge,
    position('{C.DODGE}' IN amount_raw) > 0 AS m_dodge_only,
    position('{C.SHIELD}' IN amount_raw) > 0 AS m_shield,
    position('{C.NO_DAMAGE}' IN amount_raw) > 0 AS m_immune,
    position('{C.REVIVE}' IN skill_raw) > 0 AS skill_has_revive,
    position('@' IN tgt_raw) > 0 AS tgt_has_at
  FROM f
),
enters AS (
  SELECT log_id, line_no AS start_line, ts AS start_ts, src_player AS player,
         CAST(row_number() OVER (PARTITION BY log_id ORDER BY line_no) AS INT)
           AS fight_seq,
         lead(line_no) OVER (PARTITION BY log_id ORDER BY line_no) AS next_start
  FROM typed WHERE is_enter
),
fights0 AS (
  SELECT e.*, (
    SELECT min(x.line_no) FROM typed x
    WHERE x.log_id = e.log_id AND (x.is_leave OR x.is_death)
      AND x.line_no > e.start_line
      AND x.line_no < coalesce(e.next_start, {BIG})
      AND position(e.player IN x.tgt_raw) > 0
  ) AS end_line
  FROM enters e
),
fights AS (
  SELECT f0.log_id, f0.fight_seq, f0.player, f0.start_line, f0.start_ts,
         f0.end_line, t.ts AS stop_ts,
         f0.end_line IS NOT NULL AS finished,
         (f0.end_line IS NOT NULL AND coalesce(
            SUM(CASE WHEN f0.end_line IS NOT NULL THEN 1 END) OVER (
              PARTITION BY f0.start_ts, f0.player
              ORDER BY f0.log_id, f0.fight_seq
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) >= 1)
           AS is_duplicate
  FROM fights0 f0
  LEFT JOIN typed t ON t.log_id = f0.log_id AND t.line_no = f0.end_line
),
ev AS (
  SELECT t.*, g.fight_seq, g.player AS fight_player, g.start_line, g.end_line,
         g.start_ts, g.stop_ts, g.finished, g.is_duplicate
  FROM typed t LEFT JOIN fights g
    ON t.log_id = g.log_id AND t.line_no >= g.start_line
   AND t.line_no <= coalesce(g.end_line, {BIG})
),
routed AS (
  SELECT *,
    fight_seq IS NOT NULL AS in_fight,
    (NOT coalesce(is_duplicate, FALSE) OR is_leave OR is_death
     OR line_no = start_line) AS gate,
    position(fight_player IN src_raw) > 0 AS from_has_player,
    position(fight_player IN tgt_raw) > 0 AS to_has_player,
    (fight_seq IS NOT NULL AND coalesce(finished, FALSE)
     AND line_no = end_line) AS is_exit_row
  FROM ev
),
r AS (
  SELECT *,
    in_fight AND line_no = start_line AS r_enter,
    in_fight AND gate AND is_damage AND from_has_player AS r_damage_done,
    in_fight AND gate AND is_damage AND to_has_player AS r_damage_received,
    in_fight AND gate AND is_heal_eff AND from_has_player
      AND NOT skill_has_revive AS r_heal,
    is_exit_row AS r_exit,
    in_fight AND gate AND has_threat AND from_has_player
      AND NOT is_exit_row AS r_threat,
    is_fa AND tgt_has_at AND (NOT in_fight OR gate) AS r_fa
  FROM routed
),
rs AS (
  SELECT r.*, (
    SELECT count(*) FROM fights f2
    WHERE f2.log_id = r.log_id AND f2.end_line IS NOT NULL
      AND f2.end_line < r.line_no
  ) AS seg
  FROM r
),
rh AS (
  SELECT rs.*, (
    SELECT x.src_player FROM rs x
    WHERE x.log_id = rs.log_id AND x.r_fa AND x.line_no <= rs.line_no
      AND x.seg = rs.seg
    ORDER BY x.line_no DESC LIMIT 1
  ) AS healer_id
  FROM rs
),
live AS (
  SELECT * FROM rh
  WHERE fight_seq IS NOT NULL AND finished AND NOT is_duplicate
),
live_fights AS (
  SELECT * FROM fights WHERE finished AND NOT is_duplicate
),
dd_players AS (
  SELECT log_id, fight_seq, fight_player AS player,
         coalesce(SUM(CASE WHEN amount <> 0 THEN amount END), 0) AS amount,
         arg_max(tgt_name, line_no) AS target
  FROM live WHERE r_damage_done AND NOT m_immune
  GROUP BY 1, 2, 3
),
pulls AS (
  SELECT lf.log_id, lf.fight_seq,
         lf.start_ts AS pull_start_ts,
         CASE WHEN lf.stop_ts < lf.start_ts
              THEN lf.stop_ts + INTERVAL 1 DAY ELSE lf.stop_ts END
           AS pull_stop_ts,
         dp.target, lf.player,
         CAST(coalesce(dp.amount, 0) AS BIGINT) AS total_damage
  FROM live_fights lf
  LEFT JOIN dd_players dp
    ON dp.log_id = lf.log_id AND dp.fight_seq = lf.fight_seq
   AND dp.player = lf.player
),
heal AS (
  SELECT log_id, fight_seq, healer, CAST(SUM(val) AS BIGINT) AS heal FROM (
    SELECT log_id, fight_seq, fight_player AS healer, amount AS val
    FROM live WHERE r_heal
    UNION ALL
    SELECT log_id, fight_seq, healer_id, absorbed
    FROM live
    WHERE r_damage_received AND m_absorb AND NOT m_miss
      AND absorbed <= amount
    UNION ALL
    SELECT log_id, fight_seq, player, 0 FROM live_fights
  ) GROUP BY 1, 2, 3
),
threat AS (
  SELECT log_id, fight_seq, player, CAST(SUM(val) AS BIGINT) AS threat FROM (
    SELECT log_id, fight_seq, fight_player AS player, threat AS val
    FROM live WHERE r_threat
    UNION ALL
    SELECT log_id, fight_seq, player, CAST(0 AS BIGINT) FROM live_fights
  ) GROUP BY 1, 2, 3
),
dr_players AS (
  SELECT log_id, fight_seq, fight_player AS player,
         coalesce(SUM(CASE WHEN NOT (m_miss OR m_resist OR m_dodge)
                           THEN amount ELSE 0 END), 0) AS amount
  FROM live WHERE r_damage_received
  GROUP BY 1, 2, 3
)
"""


def _spell_dim_values() -> str:
    """The J2 spell dictionary as SQL VALUES (same rows as
    datagen.spell_dim, rendered for DuckDB)."""
    from ..sources.datagen import spell_dim

    return ",\n    ".join(
        f"({sid}, '{name}', '{school}')" for sid, name, school in spell_dim())


def _assert_wellformed_markers(corpus: list[tuple[str, list[str]]]) -> None:
    """Fail loudly if the corpus violates the fight-pairing simplification
    documented above (an EnterCombat while a fight is still open, i.e. a
    non-final fight with no terminator before the next enter) — a violated
    assumption would otherwise silently produce a WRONG oracle."""
    for fname, lines in corpus:
        open_player = None
        last_enter = None
        for i, line in enumerate(lines):
            parts = [p.lstrip(" ") for p in line.split("]")]
            effect = parts[4] if len(parts) > 4 else ""
            tgt = parts[2] if len(parts) > 2 else ""
            if C.ENTER_COMBAT in effect:
                if open_player is not None:
                    raise AssertionError(
                        f"{fname}: EnterCombat at line {i} while fight from "
                        f"line {last_enter} is still open — the SQL oracle's "
                        f"pairing assumption does not hold for this corpus")
                open_player = parts[1][2:] if len(parts) > 1 else ""
                last_enter = i
            elif (C.LEAVE_COMBAT in effect or C.DEATH in effect) and \
                    open_player and open_player in tgt:
                open_player = None


def combat_oracle_queries(corpus: list[tuple[str, list[str]]]) -> dict[str, str]:
    _assert_wellformed_markers(corpus)
    base = _base_ctes(corpus)
    ms = ("strftime(%s, '%%Y-%%m-%%d %%H:%%M:%%S.%%g')")
    q: dict[str, str] = {}

    q["combat_pulls"] = base + f"""
SELECT log_id, fight_seq,
       {ms % 'pull_start_ts'} AS pull_start,
       {ms % 'pull_stop_ts'} AS pull_stop,
       target, player, 1 AS n_players, total_damage,
       CAST(floor(epoch(pull_stop_ts)) - floor(epoch(pull_start_ts)) AS BIGINT)
         AS duration_s
FROM pulls ORDER BY log_id, fight_seq
"""

    q["combat_results"] = base + f"""
SELECT log_id, fight_seq,
       strftime(timezone('Europe/Paris', timezone('UTC', pull_start_ts)),
                '%Y-%m-%d %H:%M:%S.%g') AS pull_start_paris,
       target, 1 AS n_players, total_damage,
       CAST(floor(epoch(pull_stop_ts)) - floor(epoch(pull_start_ts)) AS BIGINT)
         AS duration_s
FROM pulls ORDER BY log_id, fight_seq
"""

    # paginated /results: LIMIT binds to the SAME total order the plan
    # sorts by (start DESC with log/fight tie-breakers), so the kept
    # row-set is deterministic on both engines
    q["combat_results_page"] = base + f"""
SELECT log_id, fight_seq,
       strftime(timezone('Europe/Paris', timezone('UTC', pull_start_ts)),
                '%Y-%m-%d %H:%M:%S.%g') AS pull_start_paris,
       target, 1 AS n_players, total_damage,
       CAST(floor(epoch(pull_stop_ts)) - floor(epoch(pull_start_ts)) AS BIGINT)
         AS duration_s
FROM pulls
ORDER BY pull_start_paris DESC, log_id DESC, fight_seq DESC
LIMIT 5
"""

    q["combat_damage_done_skills"] = base + """
SELECT log_id, fight_seq, fight_player AS player, skill,
       CAST(SUM(CASE WHEN amount <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS hit,
       CAST(SUM(CASE WHEN amount = 0 AND m_dodge_only THEN 1 ELSE 0 END)
            AS BIGINT) AS dodged,
       CAST(SUM(CASE WHEN amount = 0 AND NOT m_dodge_only THEN 1 ELSE 0 END)
            AS BIGINT) AS missed,
       CAST(coalesce(SUM(CASE WHEN amount <> 0 THEN amount END), 0) AS BIGINT)
         AS total_damage
FROM live WHERE r_damage_done AND NOT m_immune
GROUP BY 1, 2, 3, 4 ORDER BY log_id, fight_seq, player, skill
"""

    q["combat_damage_received_skills"] = base + """
SELECT log_id, fight_seq, fight_player AS player, src_name AS attacker, skill,
       CAST(SUM(CASE WHEN NOT (m_miss OR m_resist OR m_dodge) THEN 1 ELSE 0 END)
            AS BIGINT) AS hit,
       CAST(SUM(CASE WHEN m_dodge AND NOT m_miss AND NOT m_resist
                     THEN 1 ELSE 0 END) AS BIGINT) AS dodged,
       CAST(SUM(CASE WHEN m_shield AND NOT (m_miss OR m_resist OR m_dodge)
                     THEN 1 ELSE 0 END) AS BIGINT) AS shielded,
       CAST(SUM(CASE WHEN m_miss THEN 1 ELSE 0 END) AS BIGINT) AS missed,
       CAST(SUM(CASE WHEN m_resist AND NOT m_miss THEN 1 ELSE 0 END)
            AS BIGINT) AS resisted,
       CAST(coalesce(SUM(CASE WHEN NOT (m_miss OR m_resist OR m_dodge)
                              THEN amount END), 0) AS BIGINT) AS total_damage,
       arg_min(dmg_type, line_no) FILTER (WHERE amount <> 0) AS dmg_type
FROM live WHERE r_damage_received
GROUP BY 1, 2, 3, 4, 5 ORDER BY log_id, fight_seq, player, attacker, skill
"""

    q["combat_heal"] = base + """
SELECT log_id, fight_seq, healer, heal FROM heal
ORDER BY log_id, fight_seq, healer
"""

    q["combat_threat"] = base + """
SELECT log_id, fight_seq, player, threat FROM threat
ORDER BY log_id, fight_seq, player
"""

    q["combat_rates"] = base + """
, keys AS (
  SELECT log_id, fight_seq, player FROM dd_players
  UNION
  SELECT log_id, fight_seq, healer FROM heal
  UNION
  SELECT log_id, fight_seq, player FROM dr_players
)
SELECT k.log_id, k.fight_seq, k.player,
       CAST(floor(coalesce(dp.amount, 0)
            / NULLIF(epoch(p.pull_stop_ts) - epoch(p.pull_start_ts), 0) * 1e6)
            AS BIGINT) AS dps_e6,
       CAST(floor(coalesce(h.heal, 0)
            / NULLIF(epoch(p.pull_stop_ts) - epoch(p.pull_start_ts), 0) * 1e6)
            AS BIGINT) AS hps_e6,
       CAST(floor(coalesce(dr.amount, 0)
            / NULLIF(epoch(p.pull_stop_ts) - epoch(p.pull_start_ts), 0) * 1e6)
            AS BIGINT) AS dtps_e6
FROM keys k
JOIN pulls p ON p.log_id = k.log_id AND p.fight_seq = k.fight_seq
LEFT JOIN dd_players dp ON dp.log_id = k.log_id AND dp.fight_seq = k.fight_seq
  AND dp.player = k.player
LEFT JOIN heal h ON h.log_id = k.log_id AND h.fight_seq = k.fight_seq
  AND h.healer IS NOT DISTINCT FROM k.player
LEFT JOIN dr_players dr ON dr.log_id = k.log_id AND dr.fight_seq = k.fight_seq
  AND dr.player = k.player
ORDER BY k.log_id, k.fight_seq, k.player
"""

    q["combat_enrich"] = base + f"""
, spell_dim(spell_id, spell_name, school) AS (VALUES
    {_spell_dim_values()}
)
SELECT coalesce(d.school, 'unknown') AS school,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN amount <> 0 THEN amount ELSE 0 END) AS BIGINT)
         AS total_damage
FROM live l LEFT JOIN spell_dim d ON l.spell_id = d.spell_id
WHERE r_damage_done AND NOT m_immune
GROUP BY 1 ORDER BY 1
"""

    q["combat_pull_json"] = base + """
, dd_g AS (
  SELECT log_id, fight_seq, fight_player, skill,
         coalesce(SUM(CASE WHEN amount <> 0 THEN amount END), 0) AS td
  FROM live WHERE r_damage_done AND NOT m_immune GROUP BY 1, 2, 3, 4
), dr_g AS (
  SELECT log_id, fight_seq, fight_player, src_name, skill
  FROM live WHERE r_damage_received GROUP BY 1, 2, 3, 4, 5
), dd_n AS (
  SELECT log_id, fight_seq, COUNT(*) AS n_dd, CAST(SUM(td) AS BIGINT) AS dd_total
  FROM dd_g GROUP BY 1, 2
), dr_n AS (
  SELECT log_id, fight_seq, COUNT(*) AS n_dr FROM dr_g GROUP BY 1, 2
), h_n AS (
  SELECT log_id, fight_seq, COUNT(*) AS n_heal,
         CAST(SUM(heal) AS BIGINT) AS heal_total
  FROM heal GROUP BY 1, 2
), t_n AS (
  SELECT log_id, fight_seq, COUNT(*) AS n_threat,
         CAST(SUM(threat) AS BIGINT) AS threat_total
  FROM threat GROUP BY 1, 2
)
SELECT p.log_id, p.fight_seq, p.target,
       coalesce(dd_n.n_dd, 0) AS n_dd,
       coalesce(dr_n.n_dr, 0) AS n_dr,
       coalesce(h_n.n_heal, 0) AS n_heal,
       coalesce(t_n.n_threat, 0) AS n_threat,
       coalesce(dd_n.dd_total, 0) AS dd_total,
       coalesce(h_n.heal_total, 0) AS heal_total,
       coalesce(t_n.threat_total, 0) AS threat_total
FROM pulls p
LEFT JOIN dd_n ON dd_n.log_id = p.log_id AND dd_n.fight_seq = p.fight_seq
LEFT JOIN dr_n ON dr_n.log_id = p.log_id AND dr_n.fight_seq = p.fight_seq
LEFT JOIN h_n ON h_n.log_id = p.log_id AND h_n.fight_seq = p.fight_seq
LEFT JOIN t_n ON t_n.log_id = p.log_id AND t_n.fight_seq = p.fight_seq
ORDER BY p.log_id, p.fight_seq
"""

    q["combat_damage_skew"] = base + """
SELECT log_id, fight_seq, src_name AS attacker,
       CAST(SUM(CASE WHEN NOT (m_miss OR m_resist OR m_dodge)
                     THEN amount ELSE 0 END) AS BIGINT) AS total_damage
FROM live WHERE r_damage_received
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

    # E3 /chart/<id> composite: point lookup of one pull, all nine gviz
    # tables re-derived (skills per O2, received per O3, pie/bar per-player
    # damage/heal/received/threat with floor(rate*1e6) DPS/HPS/DTPS), as
    # one long-format union keyed by `section`. Mirrors report/chart.py's
    # decode path but derives everything from the oracle's own live/heal/
    # threat CTEs — an independent second derivation of the same page.
    q["combat_chart"] = base + """
, selkey AS (
  SELECT log_id, fight_seq FROM pulls
  WHERE log_id = 'combat_2012-06-06_20_33_20_fixture' AND fight_seq = 1
), dur AS (
  SELECT p.target,
         strftime(p.pull_start_ts, '%Y-%m-%d %H:%M:%S.%g') AS pull_start,
         CAST(epoch_ms(p.pull_stop_ts) - epoch_ms(p.pull_start_ts)
              AS BIGINT) AS duration_ms,
         NULLIF(epoch(p.pull_stop_ts) - epoch(p.pull_start_ts), 0) AS secs
  FROM pulls p JOIN selkey k
    ON p.log_id = k.log_id AND p.fight_seq = k.fight_seq
), dd_s AS (
  SELECT l.fight_player AS player, l.skill,
         CAST(SUM(CASE WHEN amount <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS hit,
         CAST(SUM(CASE WHEN amount = 0 AND m_dodge_only THEN 1 ELSE 0 END)
              AS BIGINT) AS dodged,
         CAST(SUM(CASE WHEN amount = 0 AND NOT m_dodge_only THEN 1 ELSE 0 END)
              AS BIGINT) AS missed,
         CAST(coalesce(SUM(CASE WHEN amount <> 0 THEN amount END), 0)
              AS BIGINT) AS total_damage
  FROM live l JOIN selkey k
    ON l.log_id = k.log_id AND l.fight_seq = k.fight_seq
  WHERE r_damage_done AND NOT m_immune
  GROUP BY 1, 2
), dr_s AS (
  SELECT l.fight_player AS player, l.src_name AS attacker, l.skill,
         CAST(SUM(CASE WHEN NOT (m_miss OR m_resist OR m_dodge)
                       THEN 1 ELSE 0 END) AS BIGINT) AS hit,
         CAST(SUM(CASE WHEN m_dodge AND NOT m_miss AND NOT m_resist
                       THEN 1 ELSE 0 END) AS BIGINT) AS dodged,
         CAST(SUM(CASE WHEN m_shield AND NOT (m_miss OR m_resist OR m_dodge)
                       THEN 1 ELSE 0 END) AS BIGINT) AS shielded,
         CAST(SUM(CASE WHEN m_miss THEN 1 ELSE 0 END) AS BIGINT) AS missed,
         CAST(SUM(CASE WHEN m_resist AND NOT m_miss THEN 1 ELSE 0 END)
              AS BIGINT) AS resisted,
         CAST(coalesce(SUM(CASE WHEN NOT (m_miss OR m_resist OR m_dodge)
                                THEN amount END), 0) AS BIGINT)
           AS total_damage,
         arg_min(dmg_type, line_no) FILTER (WHERE amount <> 0) AS dmg_type
  FROM live l JOIN selkey k
    ON l.log_id = k.log_id AND l.fight_seq = k.fight_seq
  WHERE r_damage_received
  GROUP BY 1, 2, 3
), heal_t AS (
  SELECT h.healer, h.heal FROM heal h JOIN selkey k
    ON h.log_id = k.log_id AND h.fight_seq = k.fight_seq
), threat_t AS (
  SELECT t.player, t.threat FROM threat t JOIN selkey k
    ON t.log_id = k.log_id AND t.fight_seq = k.fight_seq
)
SELECT '0_header' AS section, NULL AS player, NULL AS attacker,
       NULL AS skill, CAST(NULL AS BIGINT) AS hit,
       CAST(NULL AS BIGINT) AS dodged, CAST(NULL AS BIGINT) AS missed,
       CAST(NULL AS BIGINT) AS shielded, CAST(NULL AS BIGINT) AS resisted,
       CAST(NULL AS BIGINT) AS total_damage, NULL AS dmg_type,
       CAST(NULL AS BIGINT) AS amount, CAST(NULL AS BIGINT) AS rate_e6,
       target, pull_start, duration_ms
FROM dur
UNION ALL
SELECT '1_skills', player, NULL, skill, hit, dodged, missed, NULL, NULL,
       total_damage, NULL, NULL, NULL, NULL, NULL, NULL
FROM dd_s
UNION ALL
SELECT '2_received', player, attacker, skill, hit, dodged, missed,
       shielded, resisted, total_damage, dmg_type, NULL, NULL, NULL,
       NULL, NULL
FROM dr_s
UNION ALL
SELECT '3_damage_players', g.player, NULL, NULL, NULL, NULL, NULL, NULL,
       NULL, NULL, NULL, g.amount,
       CAST(floor(g.amount / d.secs * 1e6) AS BIGINT), NULL, NULL, NULL
FROM (SELECT player, CAST(SUM(total_damage) AS BIGINT) AS amount
      FROM dd_s GROUP BY 1) g CROSS JOIN dur d
UNION ALL
SELECT '4_heal_players', h.healer, NULL, NULL, NULL, NULL, NULL, NULL,
       NULL, NULL, NULL, h.heal,
       CAST(floor(h.heal / d.secs * 1e6) AS BIGINT), NULL, NULL, NULL
FROM heal_t h CROSS JOIN dur d
UNION ALL
SELECT '5_received_players', g.player, NULL, NULL, NULL, NULL, NULL, NULL,
       NULL, NULL, NULL, g.amount,
       CAST(floor(g.amount / d.secs * 1e6) AS BIGINT), NULL, NULL, NULL
FROM (SELECT player, CAST(SUM(total_damage) AS BIGINT) AS amount
      FROM dr_s GROUP BY 1) g CROSS JOIN dur d
UNION ALL
SELECT '6_threat_players', t.player, NULL, NULL, NULL, NULL, NULL, NULL,
       NULL, NULL, NULL, t.threat, NULL, NULL, NULL, NULL
FROM threat_t t
ORDER BY section, player NULLS FIRST, attacker NULLS FIRST,
         skill NULLS FIRST
"""

    q["combat_route_counts"] = base + """
SELECT CAST(SUM(CASE WHEN r_enter THEN 1 ELSE 0 END) AS BIGINT) AS r_enter,
       CAST(SUM(CASE WHEN r_damage_done THEN 1 ELSE 0 END) AS BIGINT)
         AS r_damage_done,
       CAST(SUM(CASE WHEN r_damage_received THEN 1 ELSE 0 END) AS BIGINT)
         AS r_damage_received,
       CAST(SUM(CASE WHEN r_fa THEN 1 ELSE 0 END) AS BIGINT) AS r_fa,
       CAST(SUM(CASE WHEN r_heal THEN 1 ELSE 0 END) AS BIGINT) AS r_heal,
       CAST(SUM(CASE WHEN r_exit THEN 1 ELSE 0 END) AS BIGINT) AS r_exit,
       CAST(SUM(CASE WHEN r_threat THEN 1 ELSE 0 END) AS BIGINT) AS r_threat
FROM rh
"""
    return q
