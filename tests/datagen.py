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


def _ssn_off_by_one(ssn: str) -> str:
    digits = str(int(ssn.replace("-", "")) + 1).zfill(9)
    return f"{digits[:3]}-{digits[3:5]}-{digits[5:]}"


def _munge_dob(rng: random.Random, dob: str) -> str:
    """The reference's DOB-noise cascade, branch for branch
    (``Person.munged_dob``, generate_fake_dataset.py:137-159): day/month
    transposition, ±1 month, ±1 day, ±10 days, ±1 year, and the common
    N(0, 6 months) birthday drift; ~85% of draws return the true date."""
    from datetime import date, timedelta

    y, m, d = map(int, dob.split("-"))
    dt = date(y, m, d)
    r = rng.random()
    if dt.day <= 12 and r < 0.01:
        dt = date(dt.year, dt.day, dt.month)
    elif dt.month < 12 and r < 0.02:
        dt = date(dt.year, dt.month + 1, min(dt.day, 28))
    elif dt.month > 1 and r < 0.03:
        dt = date(dt.year, dt.month - 1, min(dt.day, 28))
    elif dt.day < 28 and r < 0.04:
        dt = date(dt.year, dt.month, dt.day + 1)
    elif dt.day > 1 and r < 0.05:
        dt = date(dt.year, dt.month, dt.day - 1)
    elif dt.day > 10 and r < 0.06:
        dt = date(dt.year, dt.month, dt.day - 10)
    elif dt.day < 19 and r < 0.07:
        dt = date(dt.year, dt.month, dt.day + 10)
    elif r < 0.09:
        dt = date(dt.year + rng.choice((-1, 1)), dt.month, min(dt.day, 28))
    elif r < 0.15:
        dt = dt + timedelta(days=rng.normalvariate(0, 365 / 2))
    return dt.isoformat()


def generate_population(
    n_people: int,
    seed: int = 0,
    mean_records: float = 4.0,
    twin_rate: float = 0.0,
    married_rate: float = 0.0,
    dob_noise: bool = False,
):
    """Returns (rows, truth, twins): rows of (entry_id, first_name,
    last_name, ssn, sex, dob), truth entry_id → person_id, twins a list of
    (person_id, person_id) sibling pairs.

    Hard cases from the reference generator (generate_fake_dataset.py):
    * ``twin_rate``: a DIFFERENT person with the same last name and dob,
      SSN off by one, different first name/sex (``Person.twin``,
      generate_fake_dataset.py:171-183) — the classic precision trap;
    * ``married_rate``: the SAME person whose later records carry a new
      last name (the reference's munged-lname married-name branch) — the
      classic recall trap;
    * ``dob_noise``: per-record DOB perturbation via the reference's
      ``munged_dob`` cascade (generate_fake_dataset.py:137-159) — the
      recall trap where the same person's records disagree on dob.
      Opt-in so pre-existing seeded fixtures keep their exact streams.
    """
    rng = random.Random(seed)
    rows, truth, twins = [], {}, []
    entry_id = 0
    people = []
    for pid in range(n_people):
        person = {
            "pid": pid,
            "first": rng.choice(FIRST),
            "last": rng.choice(LAST),
            "ssn": _ssn(rng),
            "sex": rng.choice("MF"),
            "dob": _dob(rng),
            "married_last": None,
        }
        people.append(person)
        if rng.random() < twin_rate:
            other_first = rng.choice([f for f in FIRST if f != person["first"]])
            sibling = {
                "pid": n_people + len(twins),
                "first": other_first,
                "last": person["last"],
                "ssn": _ssn_off_by_one(person["ssn"]),
                "sex": "F" if person["sex"] == "M" else "M",
                "dob": person["dob"],
                "married_last": None,
            }
            people.append(sibling)
            twins.append((person["pid"], sibling["pid"]))
    for person in people:
        if rng.random() < married_rate:
            person["married_last"] = rng.choice(
                [ln for ln in LAST if ln != person["last"]]
            )
    for person in people:
        n_rec = 1 + int(rng.expovariate(1.0 / mean_records))
        for i in range(n_rec):
            first, last = person["first"], person["last"]
            # married-name change applies to the later half of the records
            if person["married_last"] is not None and i >= (n_rec + 1) // 2:
                last = person["married_last"]
            if rng.random() < 0.2 and first in NICK:
                first = NICK[first]
            f = _typo(rng, first)
            l = _typo(rng, last)
            s = None if rng.random() < 0.15 else person["ssn"]
            sx = None if rng.random() < 0.05 else person["sex"]
            d = None if rng.random() < 0.05 else person["dob"]
            if d is not None and dob_noise:
                d = _munge_dob(rng, d)
            entry_id += 1
            rows.append((entry_id, f, l, s, sx, d))
            truth[entry_id] = person["pid"]
    return rows, truth, twins


def training_pairs(rng_seed: int = 1, n: int = 60):
    """Labeled pairs in the reference's training-JSON shape, synthesized
    from the same noise model (replaces the active-learning console loop).

    Includes the hard cases a human labeler would hit in dedupe's console
    loop against the reference generator's population
    (generate_fake_dataset.py:171-183): twin NEGATIVES (same last name and
    dob, SSN off by one, different first name and sex) and married-name
    POSITIVES (same person, later records under a new last name). Without
    these the classifier learns last_name+dob agreement alone implies a
    match and merges twins. Hard cases are a MINORITY (1 in 6 pairs):
    measured driver-side, a 50% hard mix drives the last_name weight
    negative and dob to zero, and strangers sharing a first name merge
    (base-corpus purity 0.85+ → 0.66); at 1-in-6 the boundary is clean
    (same 100% / twin 0.5% / married 100% / stranger 3% above threshold)."""
    rng = random.Random(rng_seed)
    match, distinct = [], []
    for i in range(n):
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
        if i % 3 == 1:
            # namesake negative: same first name, all else random. Without
            # these the married positives make first-name agreement carry
            # the match and namesakes merge at a measured 75% rate.
            nk = {"first_name": first, "last_name": rng.choice(LAST),
                  "ssn": _ssn(rng),
                  "sex": sex if rng.random() < 0.5 else ("F" if sex == "M" else "M"),
                  "dob": _dob(rng)}
            distinct.append((a, nk))
        if i % 6 == 0:
            # hard negative: the twin
            twin = {"first_name": rng.choice([f for f in FIRST if f != first]),
                    "last_name": last, "ssn": _ssn_off_by_one(ssn),
                    "sex": "F" if sex == "M" else "M", "dob": dob}
            distinct.append((a, twin))
            # hard positive: married-name change (new last name, same rest)
            married = {"first_name": NICK.get(first, first) if rng.random() < 0.3 else first,
                       "last_name": rng.choice([ln for ln in LAST if ln != last]),
                       "ssn": ssn, "sex": sex, "dob": dob}
            match.append((a, married))
    return {"match": match, "distinct": distinct}
