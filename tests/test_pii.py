"""PII detection/redaction — known-answer cases, a python-re
differential (RE2 and re agree on these lookaround-free patterns),
and null/empty handling.
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from cartwright_ray.stages.pii import (PII_PATTERNS, count_pii_array,
                                       pii_redact, pii_signals,
                                       redact_pii_array)

CASES = [
    ("mail me at a.b+c@ex-1.example.org today", 1, 0, 0,
     "mail me at [EMAIL] today"),
    ("server 10.0.255.7 and 192.168.1.1 up", 0, 2, 0,
     "server [IP] and [IP] up"),
    ("call 555-123-4567 or 555.987.6543", 0, 0, 2,
     "call [PHONE] or [PHONE]"),
    ("x@y.io from 8.8.8.8 dial 800 555 1212", 1, 1, 1,
     "[EMAIL] from [IP] dial [PHONE]"),
    ("no pii here 12345 almost.an@email", 0, 0, 0,
     "no pii here 12345 almost.an@email"),
    ("", 0, 0, 0, ""),
]


def test_known_answers():
    text = pa.array([c[0] for c in CASES])
    counts = count_pii_array(text)
    assert counts["email"].to_pylist() == [c[1] for c in CASES]
    assert counts["ipv4"].to_pylist() == [c[2] for c in CASES]
    assert counts["phone"].to_pylist() == [c[3] for c in CASES]
    assert redact_pii_array(text).to_pylist() == [c[4] for c in CASES]


def test_python_re_differential():
    rng = np.random.default_rng(7)
    frags = ["word", "a@b.co", "1.2.3.4", "555-123-9999", "10.0.0.1",
             "x9@mail-srv.example.com", "no", "999 888 7777", "3.14",
             "1.2.3.4.5", "123-456-78901", "u@@v.com", "-", "@", "."]
    texts = [" ".join(rng.choice(frags, size=int(rng.integers(0, 12))))
             for _ in range(300)]
    arr = pa.array(texts)
    counts = count_pii_array(arr)
    red = redact_pii_array(arr).to_pylist()
    for name, pattern, token in PII_PATTERNS:
        pyc = [len(re.findall(pattern, t)) for t in texts]
        assert counts[name].to_pylist() == pyc, name
    exp = texts
    for _, pattern, token in PII_PATTERNS:
        exp = [re.sub(pattern, token.replace("\\", "\\\\"), t)
               for t in exp]
    assert red == exp


def test_redacted_has_no_matches():
    rng = np.random.default_rng(3)
    texts = [f"u{i}@ex.com 10.{i % 256}.0.{i % 200} 555-{100 + i % 900}-"
             f"{1000 + i % 9000} tail{i}" for i in range(200)]
    red = redact_pii_array(pa.array(texts)).to_pylist()
    for _, pattern, _ in PII_PATTERNS:
        assert not any(re.search(pattern, t) for t in red)


def test_dataset_stages(ray_session):
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a@b.io here", None, "plain", "1.2.3.4 555-111-2222"]})
    ds = ray.data.from_pandas(df)
    sig = pii_signals(ds).to_pandas().sort_values("doc_id")
    assert sig["n_email"].tolist() == [1, 0, 0, 0]
    assert sig["n_ipv4"].tolist() == [0, 0, 0, 1]
    assert sig["n_phone"].tolist() == [0, 0, 0, 1]
    assert sig["has_pii"].tolist() == [True, False, False, True]
    red = pii_redact(ds).to_pandas().sort_values("doc_id")
    assert red["text_redacted"].tolist()[0] == "[EMAIL] here"
    assert red["text_redacted"].isna().tolist() == [False, True,
                                                    False, False]
    assert red["text_redacted"].tolist()[3] == "[IP] [PHONE]"
