"""Deterministic dirty-person population generator — same *noise model
shape* as the reference's test asset (``tests/generate_fake_dataset.py``:
nicknames, name endings, missing SSN/sex/dob, typos, Exp(mean) records per
person) but re-written from scratch without Faker (not in this container)
and with a fixed seed. Ground truth = person_id.
"""

from __future__ import annotations

import random
import string

FIRST = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen", "chris",
    "nancy", "daniel", "lisa", "matthew", "betty", "anthony", "margaret",
]
LAST = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
]
NICK = {"james": "jim", "robert": "bob", "john": "jack", "michael": "mike",
        "william": "bill", "richard": "dick", "joseph": "joe", "thomas": "tom",
        "charles": "chuck", "daniel": "dan", "matthew": "matt", "anthony": "tony",
        "jennifer": "jen", "elizabeth": "liz", "jessica": "jess", "margaret": "peggy"}


def _typo(rng: random.Random, s: str, rate: float = 1 / 300) -> str:
    out = []
    for ch in s:
        if rng.random() < rate:
            out.append(rng.choice(string.ascii_lowercase))
        else:
            out.append(ch)
    return "".join(out)


def _ssn(rng: random.Random) -> str:
    return f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}"


def _dob(rng: random.Random) -> str:
    return f"{rng.randint(1940, 2005)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"


def generate_population(n_people: int, seed: int = 0, mean_records: float = 4.0):
    """Returns (rows, truth): rows of (entry_id, first_name, last_name, ssn,
    sex, dob), truth entry_id → person_id."""
    rng = random.Random(seed)
    rows, truth = [], {}
    entry_id = 0
    for pid in range(n_people):
        first = rng.choice(FIRST)
        last = rng.choice(LAST)
        ssn = _ssn(rng)
        sex = rng.choice("MF")
        dob = _dob(rng)
        n_rec = 1 + int(rng.expovariate(1.0 / mean_records))
        for _ in range(n_rec):
            f = first
            if rng.random() < 0.2 and first in NICK:
                f = NICK[first]
            f = _typo(rng, f)
            l = _typo(rng, last)
            s = None if rng.random() < 0.15 else ssn
            sx = None if rng.random() < 0.05 else sex
            d = None if rng.random() < 0.05 else dob
            entry_id += 1
            rows.append((entry_id, f, l, s, sx, d))
            truth[entry_id] = pid
    return rows, truth


def training_pairs(rng_seed: int = 1, n: int = 60):
    """Labeled pairs in the reference's training-JSON shape, synthesized
    from the same noise model (replaces the active-learning console loop)."""
    rng = random.Random(rng_seed)
    match, distinct = [], []
    for _ in range(n):
        first, last = rng.choice(FIRST), rng.choice(LAST)
        ssn, sex, dob = _ssn(rng), rng.choice("MF"), _dob(rng)
        a = {"first_name": first, "last_name": last, "ssn": ssn, "sex": sex, "dob": dob}
        f2 = NICK.get(first, first) if rng.random() < 0.4 else _typo(rng, first, 0.05)
        b = {"first_name": f2, "last_name": _typo(rng, last, 0.03),
             "ssn": None if rng.random() < 0.2 else ssn, "sex": sex, "dob": dob}
        match.append((a, b))
        c = {"first_name": rng.choice(FIRST), "last_name": rng.choice(LAST),
             "ssn": _ssn(rng), "sex": rng.choice("MF"), "dob": _dob(rng)}
        distinct.append((a, c))
    return {"match": match, "distinct": distinct}
