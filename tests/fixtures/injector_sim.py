"""Deterministic injector-shaped event generator (SURVEY §2.1 S12).

Reproduces the *population dynamics* of the reference's game-event
injector (``injector/Injector.java:146-159,186-210,285-295``) that the
fixture tables don't carry:

 - a rolling set of live teams, each dissolving after a 20–40 minute
   TTL and replaced by a fresh team (``TeamInfo.expirationPeriod``);
 - ~1/3 of teams carry one robot member drawn from a global robot pool
   (``ROBOT_PROBABILITY``); when a team event fires, the robot is chosen
   with probability ``2/num_members`` vs a regular member's
   ``~1/num_members`` — the robot's click rate is ~2× any teammate's
   (``Injector.java:285-295``), and robots outlive teams, so over a run
   they accumulate far more than the 2.5× user-mean that GameStats'
   spam rule flags;
 - uniform scores in [0, max_score);
 - periodic late events delayed 5–10 minutes behind arrival time
   (``LATE_DATA_RATE``/``BASE_DELAY``/``FUZZY_DELAY``);
 - occasional corrupt CSV lines (``parseErrorRate``).

Everything is seeded ``random.Random`` — the same seed replays the same
stream, which is what makes the streaming assertions deterministic.
"""

from __future__ import annotations

import random

MAX_SCORE = 20
N_LIVE_TEAMS = 15
BASE_MEMBERS = 5
MEMBERS_SPAN = 10          # team size in [BASE_MEMBERS, BASE_MEMBERS+SPAN)
ROBOT_PROBABILITY = 3      # 1-in-3 teams get a robot
N_ROBOTS = 20
TEAM_TTL_MIN_S = 20 * 60   # 20–40 minute team lifetime
TEAM_TTL_SPAN_S = 20 * 60
LATE_EVERY = 600           # one late event per ~600 generated
BASE_DELAY_S = 5 * 60      # late events lag 5–10 minutes
FUZZY_DELAY_S = 5 * 60

ROBOT_ID_BASE = 1          # robots: user_id in [1, N_ROBOTS]
USER_ID_BASE = 1000        # humans: user_id >= 1000


class _Team:
    def __init__(self, rng: random.Random, name: str, now_s: int,
                 next_user_id: int):
        self.name = name
        self.expires_s = now_s + TEAM_TTL_MIN_S + rng.randrange(TEAM_TTL_SPAN_S)
        self.robot = (
            ROBOT_ID_BASE + rng.randrange(N_ROBOTS)
            if rng.randrange(ROBOT_PROBABILITY) == 0
            else None
        )
        n = BASE_MEMBERS + rng.randrange(MEMBERS_SPAN)
        self.members = list(range(next_user_id, next_user_id + n))

    def pick_user(self, rng: random.Random) -> int:
        # robot chosen 1-in-(n/2) -> ~2x a single member's rate
        if self.robot is not None and rng.randrange(len(self.members) // 2) == 0:
            return self.robot
        return rng.choice(self.members)


class InjectorSim:
    """Seeded generator yielding events in ARRIVAL order."""

    def __init__(self, seed: int = 42, start: str = "2024-01-01 10:00:00"):
        self.rng = random.Random(seed)
        self.start = start
        self._next_user_id = USER_ID_BASE
        self._next_team_no = 0
        self._now_s = 0
        self.teams: list[_Team] = []
        for _ in range(N_LIVE_TEAMS):
            self.teams.append(self._new_team())

    def _new_team(self) -> _Team:
        t = _Team(
            self.rng, f"team{self._next_team_no:03d}", self._now_s,
            self._next_user_id,
        )
        self._next_team_no += 1
        self._next_user_id += len(t.members)
        return t

    def robots_seen(self) -> set[int]:
        return set(range(ROBOT_ID_BASE, ROBOT_ID_BASE + N_ROBOTS))

    def generate(self, n_events: int, events_per_sec: int = 10) -> list[dict]:
        """Events in arrival order; event time = arrival time except the
        periodic late rows (5–10 min behind).  Timestamps are second
        offsets rendered onto ``self.start``'s day for fixture realism."""
        from datetime import datetime, timedelta

        base = datetime.fromisoformat(self.start)
        rows = []
        for i in range(n_events):
            self._now_s = i // events_per_sec
            ti = self.rng.randrange(len(self.teams))
            team = self.teams[ti]
            if team.expires_s <= self._now_s:
                self.teams[ti] = team = self._new_team()
            user = team.pick_user(self.rng)
            delay_s = 0
            if self.rng.randrange(LATE_EVERY) == 0:
                delay_s = BASE_DELAY_S + self.rng.randrange(FUZZY_DELAY_S)
            ts = base + timedelta(seconds=max(0, self._now_s - delay_s))
            rows.append(
                {
                    "event_id": i,
                    "ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
                    "user_id": user,
                    "event_type": team.name,
                    "value": float(self.rng.randrange(MAX_SCORE)),
                }
            )
        return rows

    def to_csv_lines(self, rows: list[dict], corrupt_every: int = 0) -> list[str]:
        """The injector's wire format (user,team,score,event_ts) with
        optional corrupt lines at a deterministic cadence."""
        out = []
        for i, r in enumerate(rows):
            if corrupt_every and i % corrupt_every == corrupt_every - 1:
                out.append("THIS LINE REPRESENTS CORRUPT DATA")
            else:
                out.append(
                    f"{r['user_id']},{r['event_type']},{int(r['value'])},{r['ts']}"
                )
        return out
