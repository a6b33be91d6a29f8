"""Report which optional-dependency legs would activate in THIS
environment (r13, round-12 verdict directive #7) — one line per leg.

The multimodal operators gate real-codec paths behind import-tries
(`codec="real"` raises fast with an actionable message when the lib is
absent; `codec="auto"` falls back to the documented stub).  The
env-gated live integration tests do the same for Kafka/Postgres.  This
tool is the operator's one-glance answer to "what would light up if I
installed X / set Y?".
"""

from __future__ import annotations

import importlib.util
import os


def main() -> None:
    legs = [
        ("Pillow", "PIL",
         "multimodal.decode_images/resize_images codec='real'"),
        ("soundfile", "soundfile",
         "multimodal.extract_audio_features codec='real'"),
        ("stdlib wave", "wave",
         "multimodal.decode_wav_pcm (always-on real RIFF decode)"),
    ]
    for name, mod, surface in legs:
        ok = importlib.util.find_spec(mod) is not None
        print(f"{'ACTIVE  ' if ok else 'DORMANT '} {name:12s} -> {surface}")
    envs = [
        ("KAFKA_BOOTSTRAP", "tests/test_live_integration.py Kafka e2e"),
        ("PG_DSN", "tests/test_live_integration.py Postgres upsert e2e"),
        ("PG_JDBC_URL", "tests/test_live_integration.py JDBC source e2e"),
    ]
    for var, surface in envs:
        ok = bool(os.environ.get(var))
        print(f"{'ACTIVE  ' if ok else 'DORMANT '} {var:12s} -> {surface}")


if __name__ == "__main__":
    main()
