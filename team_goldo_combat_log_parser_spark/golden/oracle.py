"""Test-only single-pass oracle reproducing the reference parser semantics.

This is an independent reimplementation (not a copy) of the behavior
documented in SURVEY.md par.1-2 from the reference at /root/reference
(main.py: dispatch main.py:36-53/309-330, handlers main.py:122-298,
mitigation loop main.py:55-63/203-208). It exists so pytest can compare
the distributed Spark pipeline against a trusted sequential result on any
corpus, including the reference's own golden fixtures.

Output is long-format rows matching the Spark aggregate schemas.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..constants import (
    ABSORB,
    DAMAGE,
    DEATH,
    DEFLECT,
    DODGE,
    ENTER_COMBAT,
    FORCE_ARMOR,
    HEAL,
    LEAVE_COMBAT,
    MISS,
    NO_DAMAGE,
    PARRY,
    RESIST,
    REVIVE,
    SHIELD,
)


def split_line(line: str) -> list[str] | None:
    """csv.reader(delimiter=']', skipinitialspace=True) equivalent."""
    if not line:
        return None
    parts = line.split("]")
    fields = [parts[0]] + [p.lstrip(" ") for p in parts[1:]]
    if len(fields) < 6:
        fields += [""] * (6 - len(fields))  # malformed; reference would crash
    return fields[:6]


def first_int(amount: str) -> int:
    """Leading digits of the first token after '(' — the reference's
    int()-with-ValueError-retry idiom collapses to this on valid input."""
    tok = amount[1:].split(None, 1)
    if not tok:
        return 0
    digits = ""
    for ch in tok[0]:
        if ch.isdigit():
            digits += ch
        else:
            break
    return int(digits) if digits else 0


@dataclass
class SkillDD:
    hit: int = 0
    dodged: int = 0
    missed: int = 0
    total_damage: int = 0


@dataclass
class SkillDR:
    hit: int = 0
    dodged: int = 0
    shielded: int = 0
    missed: int = 0
    resisted: int = 0
    total_damage: int = 0
    dmg_type: str | None = None


@dataclass
class Pull:
    start_time: str
    player: str
    start_line: int
    stop_time: str | None = None
    end_line: int | None = None
    target: str | None = None
    amount_done: int = 0
    amount_received: int = 0
    heal: dict = field(default_factory=dict)  # healer -> int
    threat: int = 0
    dd: dict = field(default_factory=dict)  # skill -> SkillDD
    dr: dict = field(default_factory=dict)  # (attacker, skill) -> SkillDR
    duplicate: bool = False


@dataclass
class OracleResult:
    pulls: list[Pull] = field(default_factory=list)
    route_counts: dict = field(default_factory=dict)

    def table(self, which: str) -> set[tuple]:
        """Long-format rows comparable with the Spark aggregates."""
        rows: set[tuple] = set()
        for p in self.pulls:
            key = (p.log_id, p.fight_seq)  # type: ignore[attr-defined]
            if which == "damage_done_skills":
                for skill, s in p.dd.items():
                    rows.add((*key, p.player, skill, s.hit, s.dodged, s.missed,
                              s.total_damage))
            elif which == "damage_received_skills":
                for (att, skill), s in p.dr.items():
                    rows.add((*key, p.player, att, skill, s.hit, s.dodged,
                              s.shielded, s.missed, s.resisted, s.total_damage,
                              s.dmg_type))
            elif which == "heal":
                for healer, v in p.heal.items():
                    rows.add((*key, healer, v))
            elif which == "threat":
                rows.add((*key, p.player, p.threat))
            elif which == "damage_received_players":
                rows.add((*key, p.player, p.amount_received))
            elif which == "pulls":
                rows.add((*key, p.start_time, p.stop_time, p.target, p.player,
                          p.amount_done))
        return rows


def run_oracle(logs: list[tuple[str, list[str]]]) -> OracleResult:
    """Process logs in order (the reference's upload order), sharing the
    written-pulls store across them like Datastore does."""
    res = OracleResult()
    written: set[tuple] = set()  # (start_time_str_with_date, player)
    counts = {k: 0 for k in ("enter", "damage_done", "damage_received", "fa",
                             "heal", "exit", "threat")}

    for fname, lines in logs:
        log_id = fname.rsplit(".", 1)[0]
        date = fname.split("_", 2)[1]
        in_combat = False
        ignore = False
        player: str | None = None
        healer: str | None = None
        pull: Pull | None = None
        seq = 0

        for line_no, line in enumerate(lines):
            fields = split_line(line)
            if fields is None:
                continue
            f_time, f_from, f_to, f_skill, f_effect, f_amount = fields

            if ignore and not (LEAVE_COMBAT in f_effect or DEATH in f_effect):
                continue

            # -- enter combat
            if not in_combat and ENTER_COMBAT in f_effect:
                counts["enter"] += 1
                player = f_from[2:]
                in_combat = True
                seq += 1
                start = f"{date} {f_time[1:]}"
                pull = Pull(start_time=start, player=player, start_line=line_no)
                pull.log_id = log_id  # type: ignore[attr-defined]
                pull.fight_seq = seq  # type: ignore[attr-defined]
                pull.heal[player] = 0
                if (start, player) in written:
                    ignore = True
                    pull.duplicate = True

            if in_combat and DAMAGE in f_effect and player in f_from:
                counts["damage_done"] += 1
                if NO_DAMAGE not in f_amount:
                    pull.target = f_to[1:].split("{", 1)[0]
                    skill = f_skill[1:].split("{", 1)[0]
                    s = pull.dd.setdefault(skill, SkillDD())
                    n = first_int(f_amount)
                    if n == 0:
                        if DODGE in f_amount:
                            s.dodged += 1
                        else:
                            s.missed += 1
                    else:
                        pull.amount_done += n
                        s.hit += 1
                        s.total_damage += n

            if in_combat and DAMAGE in f_effect and player in f_to:
                counts["damage_received"] += 1
                attacker = f_from[1:].split("{", 1)[0]
                skill = f_skill[1:].split("{", 1)[0]
                s = pull.dr.setdefault((attacker, skill), SkillDR())
                toks = f_amount[1:].split(None, 2)
                raw = first_int(f_amount)
                dmg_type = toks[1] if len(toks) > 1 else ""
                if raw != 0 and s.dmg_type is None:
                    s.dmg_type = dmg_type
                # ordered mitigation with early-outs
                skip_hit = False
                if MISS in f_amount:
                    s.missed += 1
                    skip_hit = True
                else:
                    if ABSORB in f_amount:
                        absorbed = int(f_amount[1:].partition("(")[2]
                                       .split(ABSORB, 1)[0].split(None, 1)[0])
                        if absorbed <= raw:
                            pull.heal[healer] = pull.heal.get(healer, 0) + absorbed
                    if RESIST in f_amount:
                        s.resisted += 1
                        skip_hit = True
                    elif (DODGE in f_amount or PARRY in f_amount
                          or DEFLECT in f_amount):
                        s.dodged += 1
                        skip_hit = True
                    elif SHIELD in f_amount:
                        s.shielded += 1
                if not skip_hit:
                    s.hit += 1
                    s.total_damage += raw
                    pull.amount_received += raw

            if FORCE_ARMOR in f_effect and "@" in f_to:
                counts["fa"] += 1
                healer = f_from[2:]

            if (in_combat and HEAL in f_effect and player in f_from
                    and REVIVE not in f_skill):
                counts["heal"] += 1
                pull.heal[player] = pull.heal.get(player, 0) + first_int(f_amount)

            exited = False
            if in_combat and (
                (DEATH in f_effect and player in f_to)
                or (LEAVE_COMBAT in f_effect and player in f_to)
            ):
                counts["exit"] += 1
                pull.stop_time = f"{date} {f_time[1:]}"
                pull.end_line = line_no
                if not ignore:
                    written.add((pull.start_time, player))
                    res.pulls.append(pull)
                in_combat = False
                ignore = False
                player = None
                healer = None
                exited = True

            if (in_combat and not exited and "<" in f_amount
                    and player in f_from):
                counts["threat"] += 1
                t = f_amount[f_amount.index("<") + 1:f_amount.index(">")]
                pull.threat += int(t)

    res.route_counts = counts
    return res
