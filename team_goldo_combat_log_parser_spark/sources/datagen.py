"""Deterministic synthetic combat-log corpus + byte-level tokenizer.

Produces the pipeline's canonical input table per the data contract:
    (doc_id string, tokens array<int>, n_tok int, source string)
doc_id = "{log_name}:{line_no:08d}"  (total order within a log),
tokens = ISO-8859-1 byte values of the raw line (token == byte, 0-255),
source = originating filename "combat_YYYY-MM-DD_HH_MM_SS_*.txt" (the
date component drives timestamp reconstruction, cf. reference main.py:112).

Everything is seeded — no wall clock, no randomness outside random.Random.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

# ---------------------------------------------------------------- line builder


def actor_player(name: str) -> str:
    return f"@{name}"


def actor_npc(name: str, npc_id: int, instance: int | None = None) -> str:
    base = f"{name} {{{npc_id}}}"
    return f"{base}:{instance}" if instance is not None else base


def mk_line(time: str, src: str, tgt: str, skill: str, effect: str, amount: str) -> str:
    """Assemble one combat-log line from its six bracketed fields."""
    return f"[{time}] [{src}] [{tgt}] [{skill}] [{effect}] {amount}"


def eff(verb: str, verb_id: int, name: str, effect_id: int) -> str:
    return f"{verb} {{{verb_id}}}: {name} {{{effect_id}}}"


VERB_EVENT = 836045448945472
VERB_APPLY = 836045448945477
VERB_REMOVE = 836045448945478

EFF_ENTER = 836045448945489
EFF_LEAVE = 836045448945490
EFF_DEATH = 836045448945493
EFF_DAMAGE = 836045448945501
EFF_HEAL = 836045448945500
EFF_FORCE_ARMOR = 812736661422080
EFF_ABILITY_ACTIVATE = 836045448945479

ID_MISS = 836045448945502
ID_PARRY = 836045448945503
ID_DODGE = 836045448945505
ID_IMMUNE = 836045448945506
ID_RESIST = 836045448945507
ID_DEFLECT = 836045448945508
ID_SHIELD = 836045448945509
ID_ABSORB = 836045448945511

DMG_TYPE_IDS = {
    "kinetic": 836045448940873,
    "energy": 836045448940874,
    "internal": 836045448940876,
    "elemental": 836045448940875,
}

MITIGATION_NAMES = {
    ID_MISS: "miss",
    ID_PARRY: "parry",
    ID_DODGE: "dodge",
    ID_IMMUNE: "immune",
    ID_RESIST: "resist",
    ID_DEFLECT: "deflect",
    ID_SHIELD: "shield",
}


def amt_plain() -> str:
    return "()"


def amt_hit(n: int, dmg_type: str | None = None, crit: bool = False,
            threat: int | None = None, shield: bool = False,
            absorbed: int | None = None) -> str:
    """Render the amount expression covering every grammar variant
    (FIXTURES.md par.3): (N) (N*) (N <type> {id}) (N* <type> {id})
    (N <type> {id} -shield {id} (M absorbed {id})) (N <type> {id} (M absorbed {id}))
    each optionally + ' <T>'."""
    body = str(n) + ("*" if crit else "")
    if dmg_type:
        body += f" {dmg_type} {{{DMG_TYPE_IDS[dmg_type]}}}"
    if shield:
        body += f" -shield {{{ID_SHIELD}}}"
    if absorbed is not None:
        body += f" ({absorbed} absorbed {{{ID_ABSORB}}})"
    out = f"({body})"
    if threat is not None:
        out += f" <{threat}>"
    return out


def amt_mitigated(mit_id: int, threat: int | None = 1) -> str:
    out = f"(0 -{MITIGATION_NAMES[mit_id]} {{{mit_id}}})"
    if threat is not None:
        out += f" <{threat}>"
    return out


def amt_truncated(n: int) -> str:
    """The '(N -)' truncated zero-damage variant seen in real logs."""
    return f"({n} -)"


# ------------------------------------------------------------ fixture corpus

# Golden single-line fixtures mirroring the reference unit-test inputs
# (reference tests_goldo.py:8-26), rebuilt from grammar components.
PLAYER = "Lor'dan"
HEALER = "Meyrah"
TENTACLE = actor_npc("Tunneling Tentacle", 3025271884087296, 13241000031137)
TERROR = actor_npc("The Terror From Beyond", 3025233229381632, 13241000114922)
STORM = "Storm {3647535335866368}"
SLAP = "Slap {3025808754999296}"
SWIPE = "Monsterous Swipe {3025456567681338}"
APPLY_DAMAGE = eff("ApplyEffect", VERB_APPLY, "Damage", EFF_DAMAGE)
APPLY_HEAL = eff("ApplyEffect", VERB_APPLY, "Heal", EFF_HEAL)


def fixture_lines() -> dict[str, str]:
    """The 14 golden fixture lines keyed by scenario name."""
    p = actor_player(PLAYER)
    return {
        "damage_done": mk_line("21:22:09.644", p, TENTACLE, STORM, APPLY_DAMAGE,
                               amt_hit(2602, "kinetic", threat=6505)),
        "damage_done_2": mk_line("21:22:10.644", p, TENTACLE, STORM, APPLY_DAMAGE,
                                 amt_hit(2602, "kinetic", threat=6505)),
        "damage_done_missed": mk_line("21:22:09.644", p, TENTACLE, STORM, APPLY_DAMAGE,
                                      amt_mitigated(ID_MISS)),
        "damage_done_dodged": mk_line("21:22:09.644", p, TENTACLE, STORM, APPLY_DAMAGE,
                                      amt_mitigated(ID_DODGE)),
        "damage_recvd": mk_line("21:22:09.775", TENTACLE, p, SLAP, APPLY_DAMAGE,
                                amt_hit(5083, "kinetic", threat=5083)),
        "damage_shielded": mk_line("21:22:09.775", TENTACLE, p, SLAP, APPLY_DAMAGE,
                                   amt_hit(2776, "kinetic", threat=2776, shield=True,
                                           absorbed=22703)),
        "apply_force_armor": mk_line("21:27:14.202", actor_player(HEALER), p,
                                     f"Force Armor {{{EFF_FORCE_ARMOR}}}",
                                     eff("ApplyEffect", VERB_APPLY, "Force Armor",
                                         EFF_FORCE_ARMOR), amt_plain()),
        "absorbed_full": mk_line("21:29:59.374", TERROR, p, SWIPE, APPLY_DAMAGE,
                                 amt_hit(8973, "kinetic", threat=8973, absorbed=8973)),
        "absorbed_shield_eq": mk_line("21:29:59.374", TERROR, p, SWIPE, APPLY_DAMAGE,
                                      amt_hit(4362, "kinetic", threat=4362, shield=True,
                                              absorbed=4362)),
        "absorbed_dodge": mk_line("21:29:59.374", TERROR, p, SWIPE, APPLY_DAMAGE,
                                  amt_mitigated(ID_DODGE)),
        "absorbed_shield_part": mk_line("21:29:59.374", TERROR, p, SWIPE, APPLY_DAMAGE,
                                        amt_hit(4362, "kinetic", threat=4362, shield=True,
                                                absorbed=638)),
        "damage_recvd_missed": mk_line("21:30:02.541", TERROR, p, SWIPE, APPLY_DAMAGE,
                                       amt_mitigated(ID_MISS)),
        "damage_recvd_dodged": mk_line("21:36:18.104",
                                       actor_npc("Tunneling Tentacle", 3025271884087296,
                                                 13241000211746),
                                       p, SLAP, APPLY_DAMAGE, amt_mitigated(ID_DODGE)),
        "damage_recvd_deflected": mk_line("23:49:54.399",
                                          actor_npc("Vilus Garr", 3054408942223360,
                                                    685001717997),
                                          p, "Pistol Shot {3128737646247936}",
                                          APPLY_DAMAGE, amt_mitigated(ID_DEFLECT)),
        "damage_recvd_parried": mk_line("23:47:39.133",
                                        actor_npc("Kell Dragon", 3067057620910080,
                                                  4632001698367),
                                        p, "Spines {3148979827113984}", APPLY_DAMAGE,
                                        amt_mitigated(ID_PARRY)),
        "heal_recvd": mk_line("21:40:55.032", p, p, "Into the Fray {3172499068026880}",
                              APPLY_HEAL, amt_hit(4480, threat=5600)),
        "negative_threat": mk_line("21:59:39.846", p,
                                   actor_npc("Pearl", 3374109127868416, 9182000098644),
                                   "Swoop {3379568031301632}",
                                   eff("Event", VERB_EVENT, "ModifyThreat",
                                       836045448945483), "() <-1492337>"),
        "resist": mk_line("21:32:04.449",
                          actor_npc("Dread Guard Dispatcher", 3288141062471680,
                                    22739000189658),
                          p, "Force Lightning {3288162537308160}", APPLY_DAMAGE,
                          amt_mitigated(ID_RESIST)),
    }


def enter_combat_line(time: str, player: str) -> str:
    p = actor_player(player)
    return mk_line(time, p, p, "", eff("Event", VERB_EVENT, "EnterCombat", EFF_ENTER),
                   amt_plain())


def exit_combat_line(time: str, player: str) -> str:
    p = actor_player(player)
    return mk_line(time, p, p, "", eff("Event", VERB_EVENT, "ExitCombat", EFF_LEAVE),
                   amt_plain())


def death_line(time: str, src: str, tgt: str) -> str:
    return mk_line(time, src, tgt, "",
                   eff("ApplyEffect", VERB_APPLY, "Death", EFF_DEATH), amt_plain())


# --------------------------------------------------------- synthetic raid logs


@dataclass
class GenConfig:
    n_logs: int = 4
    fights_per_log: int = 5
    rows_per_fight: int = 400
    boss_skew: float = 0.9  # fraction of received rows from the one "boss" actor
    seed: int = 42


_FIRST = ["Lor", "Mey", "Kel", "Vil", "Dra", "Zan", "Tal", "Ora", "Bén", "Ché"]
_LAST = ["dan", "rah", "gon", "us", "ik", "ér", "ón", "ath", "een", "ax"]
_SKILLS = [
    ("Storm", 3647535335866368), ("Slap", 3025808754999296),
    ("Monsterous Swipe", 3025456567681338), ("Pistol Shot", 3128737646247936),
    ("Force Lightning", 3288162537308160), ("Spines", 3148979827113984),
    ("Into the Fray", 3172499068026880), ("Swoop", 3379568031301632),
]
_NPCS = [
    ("Tunneling Tentacle", 3025271884087296), ("The Terror From Beyond", 3025233229381632),
    ("Kell Dragon", 3067057620910080), ("Vilus Garr", 3054408942223360),
    ("Dread Guard Dispatcher", 3288141062471680), ("Pearl", 3374109127868416),
]


def _fmt_time(ms: int) -> str:
    s, msec = divmod(ms, 1000)
    h, rem = divmod(s // 60, 60)
    return f"{h % 24:02d}:{rem:02d}:{s % 60:02d}.{msec:03d}"


def synth_log(rng: random.Random, cfg: GenConfig, log_idx: int) -> tuple[str, list[str]]:
    """One synthetic raid log: (source_filename, lines). Grammar-complete and
    boss-skewed (cfg.boss_skew of damage-received rows come from one NPC)."""
    day = 1 + (log_idx % 27)
    name = f"combat_2012-07-{day:02d}_19_{log_idx % 60:02d}_00_synth{log_idx}.txt"
    player = f"{rng.choice(_FIRST)}'{rng.choice(_LAST)}"
    healer = f"{rng.choice(_FIRST)}{rng.choice(_LAST)}"
    p = actor_player(player)
    boss_name, boss_id = rng.choice(_NPCS)
    boss = actor_npc(boss_name, boss_id, rng.randrange(10**10, 10**13))
    lines: list[str] = []
    ms = rng.randrange(68_000_000, 72_000_000)  # ~19:00

    # a little out-of-combat prelude (aura/cast rows -> cast_event & aura sinks)
    for _ in range(5):
        sk, sid = rng.choice(_SKILLS)
        lines.append(mk_line(_fmt_time(ms), p, p, f"{sk} {{{sid}}}",
                             eff("Event", VERB_EVENT, "AbilityActivate",
                                 EFF_ABILITY_ACTIVATE), amt_plain()))
        ms += rng.randrange(50, 2000)

    for _fight in range(cfg.fights_per_log):
        lines.append(enter_combat_line(_fmt_time(ms), player))
        ms += rng.randrange(50, 500)
        # healer bubbles the player early in the fight
        lines.append(mk_line(_fmt_time(ms), actor_player(healer), p,
                             f"Force Armor {{{EFF_FORCE_ARMOR}}}",
                             eff("ApplyEffect", VERB_APPLY, "Force Armor",
                                 EFF_FORCE_ARMOR), amt_plain()))
        ms += rng.randrange(50, 500)
        for _ in range(cfg.rows_per_fight):
            ms += rng.randrange(20, 900)
            t = _fmt_time(ms)
            roll = rng.random()
            sk, sid = rng.choice(_SKILLS)
            skill = f"{sk} {{{sid}}}"
            if roll < 0.40:  # damage done by player
                n = rng.randrange(100, 9000)
                variant = rng.random()
                if variant < 0.75:
                    amt = amt_hit(n, rng.choice(list(DMG_TYPE_IDS)),
                                  crit=rng.random() < 0.25,
                                  threat=n * 2)
                elif variant < 0.85:
                    amt = amt_mitigated(rng.choice([ID_MISS, ID_DODGE]))
                elif variant < 0.92:
                    amt = amt_truncated(0)
                elif variant < 0.97:
                    amt = amt_hit(n)  # bare (N)
                else:
                    amt = amt_mitigated(ID_IMMUNE)  # -immune: damage-done early-out
                lines.append(mk_line(t, p, boss, skill, APPLY_DAMAGE, amt))
            elif roll < 0.75:  # damage received by player (boss-skewed)
                attacker = boss if rng.random() < cfg.boss_skew else actor_npc(
                    *rng.choice(_NPCS), instance=rng.randrange(10**9, 10**12))
                n = rng.randrange(100, 15000)
                variant = rng.random()
                if variant < 0.55:
                    amt = amt_hit(n, rng.choice(list(DMG_TYPE_IDS)), threat=n)
                elif variant < 0.70:
                    amt = amt_mitigated(rng.choice(
                        [ID_MISS, ID_DODGE, ID_PARRY, ID_DEFLECT, ID_RESIST]))
                elif variant < 0.85:
                    amt = amt_hit(n, "kinetic", threat=n, shield=True,
                                  absorbed=rng.randrange(1, n + 2000))
                else:
                    amt = amt_hit(n, "energy", threat=n,
                                  absorbed=rng.randrange(1, n))
                lines.append(mk_line(t, attacker, p, skill, APPLY_DAMAGE, amt))
            elif roll < 0.85:  # heal by player
                n = rng.randrange(100, 6000)
                crit = rng.random() < 0.2
                lines.append(mk_line(t, p, p, skill, APPLY_HEAL,
                                     amt_hit(n, crit=crit, threat=n)))
            elif roll < 0.92:  # threat-only event row
                lines.append(mk_line(t, p, boss, skill,
                                     eff("Event", VERB_EVENT, "ModifyThreat",
                                         836045448945483),
                                     f"() <{rng.randrange(-20000, 20000)}>"))
            else:  # aura noise (Apply/RemoveEffect on others -> aura sink)
                verb = ("ApplyEffect", VERB_APPLY) if rng.random() < 0.5 else (
                    "RemoveEffect", VERB_REMOVE)
                lines.append(mk_line(t, p, p, skill,
                                     eff(verb[0], verb[1], sk, sid), amt_plain()))
        ms += rng.randrange(100, 1000)
        if rng.random() < 0.15:  # fight ends with the player dying
            lines.append(death_line(_fmt_time(ms), boss, p))
        else:
            lines.append(exit_combat_line(_fmt_time(ms), player))
        ms += rng.randrange(5_000, 60_000)
    return name, lines


def synth_corpus(cfg: GenConfig | None = None) -> list[tuple[str, list[str]]]:
    cfg = cfg or GenConfig()
    rng = random.Random(cfg.seed)
    return [synth_log(rng, cfg, i) for i in range(cfg.n_logs)]


def synth_log_rows(cfg: GenConfig, log_idx: int) -> list[tuple[str, str, str]]:
    """(doc_id, line, source) rows for ONE log with an independent per-log
    rng — the distributed-datagen unit: each executor task generates its
    own logs, so corpus size is bounded by cluster capacity, not by the
    driver heap (the shared-rng ``synth_corpus`` path is inherently
    sequential and stays for the small golden corpora)."""
    rng = random.Random((cfg.seed << 20) ^ log_idx)
    fname, lines = synth_log(rng, cfg, log_idx)
    log_name = fname.rsplit(".", 1)[0]
    return [(f"{log_name}:{i:08d}", ln, fname) for i, ln in enumerate(lines)]


def spell_dim() -> list[tuple[int, str, str]]:
    """The spell dictionary (J2 enrichment dim): (spell_id, spell_name,
    school). School is a deterministic function of the id so the DuckDB
    oracle can embed the identical dim as VALUES."""
    schools = ["kinetic", "energy", "force", "tech"]
    rows = [(sid, name, schools[sid % 4]) for name, sid in _SKILLS]
    rows.append((EFF_FORCE_ARMOR, "Force Armor", schools[EFF_FORCE_ARMOR % 4]))
    return sorted(rows)


# ------------------------------------------------------------------ tokenizer


def tokenize(line: str) -> list[int]:
    """Byte-level tokenizer: token == ISO-8859-1 byte value (0-255)."""
    return list(line.encode("iso-8859-1"))


def detokenize(tokens: list[int]) -> str:
    return bytes(bytearray(tokens)).decode("iso-8859-1")


def corpus_rows(logs: list[tuple[str, list[str]]]) -> list[tuple[str, list[int], int, str]]:
    """(doc_id, tokens, n_tok, source) rows for a list of (filename, lines)."""
    rows = []
    for fname, lines in logs:
        log_name = fname.rsplit(".", 1)[0]
        for i, line in enumerate(lines):
            toks = tokenize(line)
            rows.append((f"{log_name}:{i:08d}", toks, len(toks), fname))
    return rows


TOKEN_TABLE_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def token_df(spark, logs: list[tuple[str, list[str]]]):
    """Materialize a token-table DataFrame from (filename, lines) logs."""
    return spark.createDataFrame(corpus_rows(logs), schema=TOKEN_TABLE_SCHEMA)


def write_token_table(spark, logs, path: str, partitions: int = 8) -> None:
    (token_df(spark, logs).repartition(partitions, "source")
     .sortWithinPartitions("doc_id")
     .write.mode("overwrite").parquet(path))


def adversarial_logs() -> list[tuple[str, list[str]]]:
    """Hand-built edge-case corpus: duplicate pulls across logs, a fight
    left open at EOF, midnight rollover, a death-ended fight, Force-Armor
    rows outside combat, revive-skill heals (excluded), and a row firing
    three handlers at once."""
    p = "Zan'ik"
    pa = actor_player(p)
    healer = actor_player("Orarah")
    boss = actor_npc("Kell Dragon", 3067057620910080, 111222333)
    heal_eff = eff("ApplyEffect", VERB_APPLY, "Heal", EFF_HEAL)
    revive_skill = f"Revival {{{810619242545152}}}"

    # log A: normal fight + death-ended fight + open fight at EOF
    log_a = [
        # FA before any combat: healer state must survive into fight 1
        mk_line("20:00:01.000", healer, pa, "Force Armor {812736661422080}",
                eff("ApplyEffect", VERB_APPLY, "Force Armor", EFF_FORCE_ARMOR),
                amt_plain()),
        enter_combat_line("20:00:10.000", p),
        mk_line("20:00:11.000", pa, boss, STORM, APPLY_DAMAGE,
                amt_hit(1000, "kinetic", threat=2000)),
        # absorb credited to the pre-combat healer
        mk_line("20:00:12.000", boss, pa, SLAP, APPLY_DAMAGE,
                amt_hit(500, "kinetic", threat=500, absorbed=400)),
        # revive-skill heal: excluded by the inverted REVIVE match
        mk_line("20:00:13.000", pa, pa, revive_skill, heal_eff,
                amt_hit(9999, threat=1)),
        mk_line("20:00:14.000", pa, pa, "Bacta {1}", heal_eff,
                amt_hit(250, threat=300)),
        exit_combat_line("20:00:20.000", p),
        # fight 2 ends with the player's death
        enter_combat_line("20:01:00.000", p),
        mk_line("20:01:01.000", boss, pa, SLAP, APPLY_DAMAGE,
                amt_hit(7777, "energy", threat=7777)),
        death_line("20:01:05.000", boss, pa),
        # fight 3 never closes (EOF) -> no pull persisted
        enter_combat_line("20:02:00.000", p),
        mk_line("20:02:01.000", pa, boss, STORM, APPLY_DAMAGE,
                amt_hit(123, "kinetic", threat=246)),
    ]
    # log B: same first-fight key (start time + player) as log A -> duplicate
    log_b = [
        enter_combat_line("20:00:10.000", p),
        mk_line("20:00:11.000", pa, boss, STORM, APPLY_DAMAGE,
                amt_hit(55555, "kinetic", threat=2)),
        exit_combat_line("20:00:25.000", p),
        # second, non-duplicate fight in the same log
        enter_combat_line("20:30:00.000", p),
        mk_line("20:30:01.000", pa, boss, SLAP, APPLY_DAMAGE,
                amt_hit(42, "internal", threat=84)),
        exit_combat_line("20:30:10.000", p),
    ]
    # log C: midnight rollover — enter 23:59, exit 00:01 (same file date)
    log_c = [
        enter_combat_line("23:59:00.000", p),
        mk_line("23:59:30.000", pa, boss, STORM, APPLY_DAMAGE,
                amt_hit(300, "elemental", threat=600)),
        mk_line("00:00:30.000", pa, boss, STORM, APPLY_DAMAGE,
                amt_hit(301, "elemental", threat=602)),
        exit_combat_line("00:01:00.000", p),
    ]
    return [
        ("combat_2012-08-01_20_00_00_advA.txt", log_a),
        ("combat_2012-08-01_20_00_00_advB.txt", log_b),
        ("combat_2012-08-02_23_58_00_advC.txt", log_c),
    ]


def sample_file_log(path: str = "/root/reference/sample_file/"
                    "combat_2012-06-06_20_33_20_sample.txt") -> tuple[str, list[str]]:
    """The reference's real 3,109-line sample log (read-only, ISO-8859-1)."""
    with open(path, encoding="iso-8859-1") as fh:
        lines = [ln.rstrip("\n").rstrip("\r") for ln in fh]
    return path.rsplit("/", 1)[-1], [ln for ln in lines if ln]


def clustered_embeddings(n: int, dim: int = 16, n_clusters: int = 64,
                         noise: float = 0.05, seed: int = 7):
    """Seeded planted-cluster embedding corpus for ANN recall studies
    (tests + BENCH/IVF_RECALL.md): ``n_clusters`` unit-norm centers,
    point i = center[i % n_clusters] + gaussian noise. True cosine
    neighbors are overwhelmingly within-cluster, so an IVF quantizer's
    recall directly measures how well its cells track the clusters.
    Returns (ids, matrix) as (list[int], numpy float32 [n, dim]).
    Deterministic: numpy default_rng(seed), no wall clock."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(n) % n_clusters] \
        + noise * rng.normal(size=(n, dim))
    return list(range(n)), pts.astype("float32")
