#!/usr/bin/env python3
"""Differential fuzz gate: the reference service's OWN normalizers, executed
from /root/reference, vs the engine's Ingest.envelopes — compared
record-by-record on canonicalized JSON (r16 verdict task 1).

The reference's `_normalize_perf_data` / `_normalize_ue_mobility` /
`_normalize_ue_comm` / `parse_bitrate_mbps` / `parse_datetime_to_unix`
(receiver.py:69-196) are IMPORTED and EXECUTED, not re-implemented: the
module loads with conftest-style sys.modules mocks (the exact pattern the
reference's own tests use, tests/conftest.py:26-59) for the packages this
container lacks (fastapi/pydantic/requests/auth_middleware/utils.kmw/
policy_client). Only the ~25-line endpoint DISPATCH glue (context-tag build
+ event dispatch, receiver.py:357-389 — inline endpoint code, not an
importable function) is mirrored here, line-cited.

Pipeline:
  gen    — write the seeded corpus (tools/fuzz/corpus.jsonl.gz, one payload
           JSON per line) + subscription dimension (subscriptions.jsonl)
  pyrun  — run every payload through the reference normalizers -> canonical
           records at /tmp/fuzz_py.jsonl
  scala  — sbt runMain graft.FuzzNormalize (engine side) -> /tmp/fuzz_spark
  check  — canonicalize both sides, compare per-notifId record multisets
           byte-exactly, print diffs, exit 1 on any
  all    — gen (if corpus absent) + pyrun + scala + check

Canonical record form (both sides): json.dumps(sort_keys, ensure_ascii) of
{timestamp, tags, event, metrics} where the engine's typed sibling columns
trajectory/comms fold back into `metrics` (the documented schema deviation,
Sinks.scala kafkaBatches note) and absent-vs-null inside trajectory/comms
ENTRIES is normalized to null on both sides (the reference emits every
entry key, possibly None; the engine's to_json drops null struct fields).
Absent-vs-null for TAGS and scalar METRIC keys is NOT normalized — matching
the conditional-insert truthiness semantics is precisely what this gate
tests. Scalar metric values canonicalize integral floats to ints (the
engine's metrics ride a Map<String,Double>; the reference mixes int/float).

Domain constraints (documented deviations, not generated):
 - int-metric values that are non-integer STRINGS ("17.8"): reference
   raises (whole request 500s); engine truncates to an absent-on-garbage
   key (SURVEY F4 deviation, PipelineSpec golden).
 - ulVol/dlVol as non-integer numbers: 3GPP Volume is int64; the engine's
   declared LongType would corrupt-row the payload in PERMISSIVE mode.
 - int metrics beyond 2^50: the engine's metric map is double-valued.
 - compact ISO-8601 ("20260816T120000"): python 3.11 fromisoformat accepts,
   Spark try_to_timestamp does not (-> now-fallback). Not a 3GPP shape.
 - pre-epoch fractional timestamps: int() truncates toward zero, Spark
   casts floor — generated pre-epoch stamps are whole-second.
Everything else — truthiness traps (sst=0, sd="", appId="", ipv4 ""+ipv6
elif), epoch-0 timestamps (0 is falsy -> now), garbage datetimes, missing
units, bare numbers, empty/null/absent arrays, unknown notifId (403),
missing notifId (400), unsupported events, unicode incl. lone surrogates,
malformed JSON lines — is generated and compared.
"""
import gzip
import io
import json
import os
import random
import subprocess
import sys
import tempfile
import types
from collections import Counter
from unittest.mock import MagicMock

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FUZZ_DIR = os.path.join(HERE, "fuzz")
FIXED_NOW = 1765432100
DEFAULT_SEED = 20260816
# FUZZ_SEED / FUZZ_N run extra shakeout corpora; only the default seed
# writes into the COMMITTED corpus location (tools/fuzz/)
SEED = int(os.environ.get("FUZZ_SEED", DEFAULT_SEED))
N_PAYLOADS = int(os.environ.get("FUZZ_N", 4000))
_BASE = FUZZ_DIR if SEED == DEFAULT_SEED else f"/tmp/fuzz_{SEED}"
CORPUS = os.path.join(_BASE, "corpus.jsonl.gz")
SUBS = os.path.join(_BASE, "subscriptions.jsonl")
PY_OUT = f"/tmp/fuzz_py_{SEED}.jsonl"
SPARK_OUT = f"/tmp/fuzz_spark_out_{SEED}"


# ── reference import (conftest.py:26-59 pattern) ─────────────────────────────

def load_reference():
    for name in ("fastapi", "fastapi.middleware", "fastapi.middleware.cors",
                 "requests", "auth_middleware", "utils", "utils.kmw",
                 "policy_client"):
        sys.modules.setdefault(name, MagicMock())
    pyd = types.ModuleType("pydantic")
    pyd.BaseModel = object  # receiver.py:287 subclasses it; annotations only
    sys.modules.setdefault("pydantic", pyd)
    os.environ["REGISTRY_DB"] = os.path.join(
        tempfile.mkdtemp(prefix="fuzz-registry"), "registry.db")
    sys.path.insert(0, REF)
    import receiver  # noqa: E402
    # deterministic now-fallback: int(time.time()) (receiver.py:128 etc.)
    receiver.time = types.SimpleNamespace(time=lambda: float(FIXED_NOW))
    return receiver


def notify(receiver, payload, registry):
    """Mirror of the /nef/notify dispatch glue (receiver.py:357-389).

    Returns the normalized record list; [] for the 400 (missing notifId,
    receiver.py:360-361), 403 (unknown notifId, receiver.py:363-365), and
    exception (HTTP 500 aborts the whole request pre-Kafka) paths.
    """
    notif_id = payload.get("notifId")
    if not notif_id:
        return []
    context = registry.get(notif_id)
    if not context:
        return []
    context_tags = {}
    snssai = context.get("snssai")  # receiver.py:368-372 (walrus truthiness)
    if snssai:
        sst = snssai.get("sst")
        if sst is not None:
            context_tags["snssai_sst"] = sst
        sd = snssai.get("sd")
        if sd:
            context_tags["snssai_sd"] = sd
    if context.get("dnn"):  # receiver.py:373-374
        context_tags["dnn"] = context["dnn"]
    records = []
    for event_notif in payload.get("eventNotifs") or []:  # receiver.py:377
        ni = receiver._EVENT_NORMALIZERS.get(event_notif.get("event"))
        if not ni:
            continue  # unsupported event (receiver.py:380-382)
        field_name, normalizer = ni
        for info in event_notif.get(field_name) or []:  # receiver.py:384
            rec = normalizer(info, context_tags)
            if rec:
                records.append(rec)
    return records


# ── canonical form ────────────────────────────────────────────────────────────

TRAJ_KEYS = ("ts", "tac", "nrCellId")
COMM_KEYS = ("startTime", "endTime", "ulVol", "dlVol")


def _canon_num(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
        return int(v)
    return v


def _jvm_str(v):
    """Documented deviation: unpaired UTF-16 surrogates are replaced with
    '?' by the JVM's UTF-8 encoder (String.getBytes), so the engine stores
    'bad?end' where CPython's str tolerates 'bad\\ud800end'. Unreachable on
    a real wire — a lone surrogate cannot be encoded in valid UTF-8; only a
    JSON \\ud800 escape produces one. Applied to the REFERENCE side so the
    rest of the record still compares byte-exactly."""
    if isinstance(v, str):
        return v.encode("utf-8", errors="replace").decode("utf-8")
    return v


def canon_py(rec):
    m = {}
    for k, v in rec["metrics"].items():
        if k == "trajectory":
            m[k] = [{kk: _jvm_str(e.get(kk)) for kk in TRAJ_KEYS} for e in v]
        elif k == "comms":
            m[k] = [{kk: e.get(kk) for kk in COMM_KEYS} for e in v]
        else:
            m[k] = _canon_num(v)
    return json.dumps(
        {"timestamp": int(rec["timestamp"]),
         "tags": {k: _jvm_str(v) for k, v in rec["tags"].items()},
         "event": rec["event"], "metrics": m},
        sort_keys=True, ensure_ascii=True)


def canon_spark(obj):
    m = {k: _canon_num(v) for k, v in (obj.get("metrics") or {}).items()}
    if "trajectory" in obj:
        m["trajectory"] = [{kk: e.get(kk) for kk in TRAJ_KEYS}
                           for e in obj["trajectory"]]
    if "comms" in obj:
        m["comms"] = [{kk: e.get(kk) for kk in COMM_KEYS}
                      for e in obj["comms"]]
    return obj["notifId"], json.dumps(
        {"timestamp": int(obj["timestamp"]), "tags": obj.get("tags") or {},
         "event": obj["event"], "metrics": m},
        sort_keys=True, ensure_ascii=True)


# ── corpus generator ──────────────────────────────────────────────────────────

def make_subscriptions():
    """Subscription dimension covering the context-tag truthiness traps
    (receiver.py:368-374 / registry.py:47-49)."""
    return [
        {"notif_id": "sub-00", "snssai": {"sst": 0, "sd": ""}, "dnn": "internet"},
        {"notif_id": "sub-01", "snssai": {"sst": 1, "sd": "abc123"}, "dnn": ""},
        {"notif_id": "sub-02", "snssai": None, "dnn": "ims"},
        {"notif_id": "sub-03", "snssai": {}, "dnn": None},
        {"notif_id": "sub-04", "snssai": {"sd": "d00d00"}, "dnn": "corp"},
        {"notif_id": "sub-05", "snssai": {"sst": 255}, "dnn": None},
        {"notif_id": "sub-06", "snssai": None, "dnn": None},
        {"notif_id": "sub-07", "snssai": {"sst": 42, "sd": "café"},
         "dnn": "dnn.mnc001.mcc001"},
    ]


STRINGS = ["", " ", "0", "false", "alpha", "café", "日本語", "emoji-😀-end",
           "x" * 300, "line\nbreak", "tab\there", "quo\"te", "back\\slash"]
LONE_SURROGATE = "bad\ud800end"  # escapes as \ud800 under ensure_ascii

DATETIMES = [
    "2026-08-16T12:00:00Z", "2026-08-16T12:00:00+00:00",
    "2026-08-16T14:30:00+02:30", "2026-08-16T12:00:00.5Z",
    "2026-08-16T12:00:00.123456Z", "2026-08-16 12:00:00",
    "2026-08-16T12:00:00", "2026-08-16",
    "1970-01-01T00:00:00Z",            # epoch-0: parses to 0, 0 is falsy -> now
    "1970-01-01T01:00:00+01:00",       # epoch-0 via offset
    "1969-12-31T23:00:00Z",            # pre-epoch whole-second (negative)
    "not-a-time", "2026-13-45T99:99:99Z", "2026-02-30T00:00:00Z", "",
    "2026-08-16T12:00:00z",            # lowercase z
    "2026-08-16T12:00",                # no seconds
    "2026-8-16T12:00:00Z",             # non-padded month
    " 2026-08-16T12:00:00Z",           # leading whitespace
    "2026-08-16T12:00:00-07:00", "2026-08-16T12:00:00.999999Z",
    "2262-04-11T23:47:16Z",            # near int64-nanos ceiling
    "0001-01-01T00:00:00Z",            # far pre-epoch
]

BITRATES = [
    "48.57 Mbps", "0.5Gbps", "100 Kbps", "1.5 bps", "12 Tbps", "  7 Mbps  ",
    "5. Mbps", "0 Mbps", "976.5 Kbps", "3.141592 Gbps", "100", "fast",
    ".5 Mbps", "-5 Mbps", "1e3 Mbps", "48.57 mbps", "", 42.5, 0, 1250,
]

INT_METRICS = [0, 17, -3, 1000, 2**40, 17.8, -2.5, "42", "-7", "017", " 42 "]


def _maybe(rng, p, val):
    return val if rng.random() < p else None


def gen_perf_info(rng):
    info = {}
    ip = rng.random()
    if ip < 0.2:
        pass  # no ueIpAddr
    elif ip < 0.3:
        info["ueIpAddr"] = {}
    elif ip < 0.5:
        info["ueIpAddr"] = {"ipv4Addr": rng.choice(["10.0.0.1", "", "192.168.1.9"])}
    elif ip < 0.65:
        info["ueIpAddr"] = {"ipv6Addr": rng.choice(["2001:db8::1", "", "fe80::1"])}
    elif ip < 0.85:  # the elif trap: ipv4 wins only when truthy
        info["ueIpAddr"] = {"ipv4Addr": rng.choice(["10.1.1.1", ""]),
                            "ipv6Addr": "2001:db8::9"}
    else:
        info["ueIpAddr"] = None
    if rng.random() < 0.6:
        info["appId"] = rng.choice(STRINGS + [LONE_SURROGATE])
    if rng.random() < 0.8:
        info["timeStamp"] = rng.choice(DATETIMES)
    pd_roll = rng.random()
    if pd_roll < 0.1:
        pass  # perfData absent
    elif pd_roll < 0.15:
        info["perfData"] = None
    else:
        perf = {}
        for f in ("thrputUl", "thrputDl", "maxThrputUl", "minThrputUl",
                  "maxThrputDl", "minThrputDl"):
            if rng.random() < 0.5:
                v = rng.choice(BITRATES)
                perf[f] = v if rng.random() < 0.9 else None
        for f in ("pdb", "pdbDl", "maxPdbUl", "maxPdbDl",
                  "plr", "plrDl", "maxPlrUl", "maxPlrDl"):
            if rng.random() < 0.4:
                v = rng.choice(INT_METRICS)
                perf[f] = v if rng.random() < 0.9 else None
        info["perfData"] = perf
    return info


def gen_traj(rng):
    t = {}
    if rng.random() < 0.8:
        t["ts"] = rng.choice(DATETIMES)
    loc = rng.random()
    if loc < 0.15:
        pass
    elif loc < 0.25:
        t["location"] = None
    elif loc < 0.35:
        t["location"] = {}
    elif loc < 0.45:
        t["location"] = {"nrLocation": {}}
    else:
        nr = {}
        if rng.random() < 0.7:
            nr["tai"] = {"plmnId": {"mcc": "001", "mnc": "01"},
                         "tac": rng.choice(["AB12", "", "000001"])}
        if rng.random() < 0.7:
            nr["ncgi"] = {"nrCellId": rng.choice(["000000001", "", "FFFFFFFFF"])}
        t["location"] = {"nrLocation": nr}
    return t


def gen_mobility_info(rng):
    info = {}
    if rng.random() < 0.6:
        info["supi"] = rng.choice(["imsi-001010000000001", "", "imsi-X"])
    if rng.random() < 0.5:
        info["gpsi"] = rng.choice(["msisdn-5551234", "", "ext-id@dom"])
    roll = rng.random()
    if roll < 0.15:
        pass
    elif roll < 0.25:
        info["ueTrajs"] = None
    elif roll < 0.35:
        info["ueTrajs"] = []
    else:
        info["ueTrajs"] = [gen_traj(rng) for _ in range(rng.randint(1, 3))]
    return info


def gen_comm_info(rng):
    info = {}
    if rng.random() < 0.6:
        info["supi"] = rng.choice(["imsi-001010000000002", "", "imsi-Y"])
    if rng.random() < 0.4:
        info["interGroupId"] = rng.choice(["grp-1", "", "grp-é"])
    if rng.random() < 0.5:
        info["gpsi"] = rng.choice(["msisdn-5559999", ""])
    roll = rng.random()
    if roll < 0.15:
        pass
    elif roll < 0.25:
        info["comms"] = None
    elif roll < 0.35:
        info["comms"] = []
    else:
        comms = []
        for _ in range(rng.randint(1, 3)):
            c = {}
            if rng.random() < 0.8:
                c["startTime"] = rng.choice(DATETIMES)
            if rng.random() < 0.8:
                c["endTime"] = rng.choice(DATETIMES)
            if rng.random() < 0.8:
                c["ulVol"] = rng.choice([0, 1, 1024, 10**12, None])
            if rng.random() < 0.8:
                c["dlVol"] = rng.choice([0, 7, 2048, 10**13, None])
            comms.append(c)
        info["comms"] = comms
    return info


EVENTS = ["PERF_DATA", "UE_MOBILITY", "UE_COMM"]
INFO_FIELD = {"PERF_DATA": ("perfDataInfos", gen_perf_info),
              "UE_MOBILITY": ("ueMobilityInfos", gen_mobility_info),
              "UE_COMM": ("ueCommInfos", gen_comm_info)}


def gen_event_notif(rng):
    en = {}
    ev_roll = rng.random()
    if ev_roll < 0.82:
        ev = rng.choice(EVENTS)
        en["event"] = ev
    elif ev_roll < 0.9:
        ev = None
        en["event"] = rng.choice(["QOS_SUSTAINABILITY", "LOSS_OF_CONNECTIVITY",
                                  "", None])
    else:
        ev = None  # event key absent entirely
    if ev is not None:
        field, gen = INFO_FIELD[ev]
        roll = rng.random()
        if roll < 0.08:
            pass  # infos array absent -> `or []`
        elif roll < 0.14:
            en[field] = None
        elif roll < 0.2:
            en[field] = []
        else:
            en[field] = [gen(rng) for _ in range(rng.randint(1, 4))]
        # sometimes ALSO carry another event's infos array — must be ignored
        if rng.random() < 0.1:
            other = rng.choice([e for e in EVENTS if e != ev])
            ofield, ogen = INFO_FIELD[other]
            en[ofield] = [ogen(rng)]
    else:
        # unsupported/missing event may still carry payload arrays
        if rng.random() < 0.5:
            field, gen = INFO_FIELD[rng.choice(EVENTS)]
            en[field] = [gen(rng)]
    return en


def gen_payload(rng, sub_ids):
    roll = rng.random()
    if roll < 0.9:
        notif_id = rng.choice(sub_ids)
    elif roll < 0.95:
        notif_id = rng.choice(["ghost-1", "ghost-2"])  # 403 path
    else:
        notif_id = rng.choice([None, "", 123, 0])  # 400/coercion paths
    payload = {}
    if notif_id is not None:
        payload["notifId"] = notif_id
    en_roll = rng.random()
    if en_roll < 0.05:
        pass  # eventNotifs absent
    elif en_roll < 0.08:
        payload["eventNotifs"] = None
    elif en_roll < 0.12:
        payload["eventNotifs"] = []
    else:
        payload["eventNotifs"] = [gen_event_notif(rng)
                                  for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.1:  # unknown extra fields are ignored on both sides
        payload["x-extra"] = {"a": 1, "b": [True, None]}
    return payload


def cmd_gen():
    os.makedirs(_BASE, exist_ok=True)
    rng = random.Random(SEED)
    subs = make_subscriptions()
    with open(SUBS, "w") as f:
        for s in subs:
            row = {"notif_id": s["notif_id"], "snssai": s["snssai"] or None,
                   "dnn": s["dnn"], "events": ["PERF_DATA"],
                   "nef_sub_id": "nef-" + s["notif_id"],
                   "nef_url": "http://nef.example/notify",
                   "created_at": 1765000000}
            # an empty snssai dict must survive as {} (falsy in python, struct
            # with null fields in the engine) — json round-trip keeps it
            if s["snssai"] == {}:
                row["snssai"] = {}
            f.write(json.dumps(row, ensure_ascii=True) + "\n")
    sub_ids = [s["notif_id"] for s in subs]
    n_malformed = 0
    with gzip.open(CORPUS, "wt", encoding="ascii") as f:
        for i in range(N_PAYLOADS):
            if rng.random() < 0.01:  # malformed JSON: 500 there, DLQ here
                f.write('{"notifId": "sub-01", "eventNotifs": [unclosed\n')
                n_malformed += 1
                continue
            if rng.random() < 0.01:
                # duplicate JSON keys: LAST occurrence wins on both engines
                # (CPython dict build; Jackson field overwrite) — probed,
                # agreeing; kept in the corpus so a parser swap that
                # changes to first-wins fails the gate
                f.write('{"notifId":"sub-01","eventNotifs":[{"event":'
                        '"PERF_DATA","perfDataInfos":[{"appId":"first",'
                        '"appId":"second","timeStamp":'
                        '"2026-01-01T00:00:00Z","timeStamp":'
                        '"2027-01-01T00:00:00Z"}]}]}\n')
                continue
            f.write(json.dumps(gen_payload(rng, sub_ids), ensure_ascii=True)
                    + "\n")
    print(f"[fuzz] wrote {N_PAYLOADS} payloads ({n_malformed} malformed) "
          f"-> {CORPUS}; {len(subs)} subscriptions -> {SUBS}")


# ── run reference side ───────────────────────────────────────────────────────

def load_registry():
    """Route the subscriptions through the reference's OWN NfRegistry
    (registry.py): add() (json.dumps storage, `{} if snssai else None`
    normalization), then a FRESH instance re-reads the sqlite file so the
    context the normalizers see has crossed the reference's full
    persist/reload/copy-on-get path (registry.py:36-53, 92-95)."""
    import registry as refreg  # sys.path has /root/reference after load_reference
    db = os.path.join(tempfile.mkdtemp(prefix="fuzz-subs"), "registry.db")
    reg = refreg.NfRegistry(db_path=db)
    with open(SUBS) as f:
        for line in f:
            row = json.loads(line)
            reg.add(notif_id=row["notif_id"], snssai=row["snssai"],
                    dnn=row["dnn"], events=row["events"],
                    nef_sub_id=row["nef_sub_id"], nef_url=row["nef_url"])
    return refreg.NfRegistry(db_path=db)  # reload-from-disk semantics


def cmd_pyrun():
    receiver = load_reference()
    registry = load_registry()
    n_payloads = n_records = n_errors = 0
    with gzip.open(CORPUS, "rt", encoding="ascii") as f, \
            open(PY_OUT, "w") as out:
        for line in f:
            n_payloads += 1
            try:
                payload = json.loads(line)
                records = notify(receiver, payload, registry)
            except Exception:
                n_errors += 1  # HTTP 500: request dies, nothing produced
                continue
            nid = payload.get("notifId")
            for rec in records:
                out.write(json.dumps({"notifId": nid, "rec": canon_py(rec)})
                          + "\n")
                n_records += 1
    print(f"[fuzz] reference side: {n_payloads} payloads -> {n_records} "
          f"records ({n_errors} request errors) -> {PY_OUT}")


# ── run engine side ──────────────────────────────────────────────────────────

def cmd_scala():
    cmd = ["sbt", "-batch",
           f"runMain graft.FuzzNormalize {CORPUS} {SUBS} {SPARK_OUT} {FIXED_NOW}"]
    print("[fuzz] " + " ".join(cmd))
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        sys.exit(f"[fuzz] engine run failed: exit {r.returncode}")


# ── compare ──────────────────────────────────────────────────────────────────

def read_spark_records():
    recs = Counter()
    for name in sorted(os.listdir(SPARK_OUT)):
        if not name.startswith("part-"):
            continue
        with open(os.path.join(SPARK_OUT, name), "rb") as f:
            data = f.read().decode("utf-8", errors="surrogatepass")
        for line in io.StringIO(data):
            line = line.strip()
            if not line:
                continue
            nid, canon = canon_spark(json.loads(line))
            recs[(nid, canon)] += 1
    return recs


def cmd_check():
    py = Counter()
    with open(PY_OUT) as f:
        for line in f:
            row = json.loads(line)
            py[(row["notifId"], row["rec"])] += 1
    sp = read_spark_records()
    only_py = py - sp
    only_sp = sp - py
    print(f"[fuzz] reference records: {sum(py.values())}, engine records: "
          f"{sum(sp.values())}, agree: {sum((py & sp).values())}")
    if not only_py and not only_sp:
        print("[fuzz] PASS: zero diffs")
        return
    for label, diff in (("ONLY-REFERENCE", only_py), ("ONLY-ENGINE", only_sp)):
        shown = 0
        for (nid, canon), n in diff.items():
            print(f"[fuzz] {label} x{n} notifId={nid}: {canon}")
            shown += 1
            if shown >= 10:
                print(f"[fuzz] ... {len(diff) - shown} more {label} keys")
                break
    sys.exit(1)


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "gen":
        cmd_gen()
    elif cmd == "pyrun":
        cmd_pyrun()
    elif cmd == "scala":
        cmd_scala()
    elif cmd == "check":
        cmd_check()
    elif cmd == "all":
        if not os.path.exists(CORPUS):
            cmd_gen()
        cmd_pyrun()
        cmd_scala()
        cmd_check()
    else:
        sys.exit(f"unknown subcommand {cmd}; use gen|pyrun|scala|check|all")


if __name__ == "__main__":
    main()
