"""Logstash keystore (secret store) reader/writer.

Reference format — org/logstash/secret/store/backend/JavaKeyStore.java:
a PKCS12 keystore (JavaKeyStore.java:78 ``KEYSTORE_TYPE = "pkcs12"``)
whose entries are PBE secret keys: each secret's bytes are base64-encoded
and stored as the password of a ``PBEKeySpec`` (persistSecret,
JavaKeyStore.java:330-335), under the alias
``urn:logstash:secret:v1:<key>`` (SecretIdentifier.java:32).  The
keystore password comes from, in order: the ``LOGSTASH_KEYSTORE_PASS``
environment variable (SecretStoreFactory.java:47,157), else the
"default pass" appended to the file itself — the last byte is a length n,
the n bytes before it are the obfuscated password
(JavaKeyStore.java:213-230 read, :427-431 write), de-obfuscated by
xor-ing the first half against the random second half
(SecretStoreUtil.java:150-158).

The crypto (PKCS12 parsing, PBE key unwrap) is done by the JVM that is
already running under the Spark driver — via the py4j gateway, not a
Python reimplementation — so any keystore the reference's
``logstash-keystore`` CLI created reads back byte-identically.  Secrets
resolve at CONFIG-COMPILE time on the driver into the same env snapshot
``${VAR}`` expansion uses (plans/lscl._env_snapshot); executors only ever
see expanded literals, never the keystore.
"""

from __future__ import annotations

import base64
import os
import re

#: SecretStoreFactory.java:47
ENV_PASS_KEY = "LOGSTASH_KEYSTORE_PASS"
#: SecretIdentifier.java:32 — urn:logstash:secret:v1:<key>
_URN_RE = re.compile(r"^urn:logstash:secret:v1:(.+)$")
#: SecretStoreFactory LOGSTASH_MARKER key — present in every reference
#: keystore, not a user secret
MARKER_KEY = "keystore.seed"


def _deobfuscate(data: bytes) -> str:
    """SecretStoreUtil.deObfuscate: [xor half][random half] -> password."""
    half = len(data) // 2
    xored, rand = data[:half], data[half:]
    return bytes(x ^ r for x, r in zip(xored, rand)).decode("ascii")


def _obfuscate(password: str) -> bytes:
    pw = password.encode("ascii")
    rand = os.urandom(len(pw))
    return bytes(b ^ r for b, r in zip(pw, rand)) + rand


def read_trailer_password(path: str) -> str:
    """The default-pass trailer: last byte = n, previous n bytes = the
    obfuscated password (JavaKeyStore.java:213-230)."""
    with open(path, "rb") as f:
        raw = f.read()
    if not raw:
        raise ValueError(f"keystore {path} is empty")
    n = raw[-1]
    if n <= 0 or len(raw) < n + 1:
        raise ValueError(
            f"keystore {path}: no password trailer — set {ENV_PASS_KEY}")
    return _deobfuscate(raw[-n - 1:-1])


def _resolve_password(path: str, password: str | None) -> str:
    if password is not None:
        if not password:
            raise ValueError("empty keystore passwords are not allowed")
        return password
    env_pass = os.environ.get(ENV_PASS_KEY)
    if env_pass is not None:
        return env_pass
    return read_trailer_password(path)


def _jvm(spark):
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "keystore: need a running SparkSession (the JVM does the "
                "PKCS12/PBE work) — pass spark= or start a session first")
    sc = spark.sparkContext
    return sc._jvm, sc._gateway


def _chars(gw, jvm, s: str):
    arr = gw.new_array(jvm.char, len(s))
    for i, c in enumerate(s):
        arr[i] = c
    return arr


def load_keystore(path: str, password: str | None = None,
                  spark=None) -> dict[str, str]:
    """Read every secret from a reference-format keystore into
    ``{key: value}`` — the map ``${VAR}`` expansion consumes."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Can not find Logstash keystore at {path}")
    pw = _resolve_password(path, password)
    jvm, gw = _jvm(spark)
    ks = jvm.java.security.KeyStore.getInstance("pkcs12")
    fis = jvm.java.io.FileInputStream(path)
    try:
        ks.load(fis, _chars(gw, jvm, pw))
    finally:
        fis.close()
    factory = jvm.javax.crypto.SecretKeyFactory.getInstance("PBE")
    protection = jvm.java.security.KeyStore.PasswordProtection(
        _chars(gw, jvm, pw))
    spec_cls = jvm.java.lang.Class.forName("javax.crypto.spec.PBEKeySpec")
    out: dict[str, str] = {}
    aliases = ks.aliases()
    while aliases.hasMoreElements():
        alias = aliases.nextElement()
        m = _URN_RE.match(alias)
        if not m or m.group(1) == MARKER_KEY:
            continue
        entry = ks.getEntry(alias, protection)
        spec = factory.getKeySpec(entry.getSecretKey(), spec_cls)
        b64 = "".join(spec.getPassword())
        out[m.group(1)] = base64.b64decode(b64).decode("utf-8")
    return out


def create_keystore(path: str, secrets: dict[str, str],
                    password: str | None = None, spark=None) -> None:
    """``logstash-keystore create``/``add`` analog: write a keystore the
    reference can read.  With ``password=None`` the default-pass layout is
    produced (random password, obfuscated trailer appended)."""
    use_default = password is None
    pw = (base64.b64encode(os.urandom(32)).decode("ascii")
          if use_default else password)
    if not pw:
        raise ValueError("empty keystore passwords are not allowed")
    jvm, gw = _jvm(spark)
    ks = jvm.java.security.KeyStore.getInstance("pkcs12")
    ks.load(None, _chars(gw, jvm, pw))
    factory = jvm.javax.crypto.SecretKeyFactory.getInstance("PBE")
    protection = jvm.java.security.KeyStore.PasswordProtection(
        _chars(gw, jvm, pw))
    entry_cls = jvm.java.security.KeyStore.SecretKeyEntry
    # the marker entry every reference keystore carries
    # (JavaKeyStore.java:117-119: its value is base64 of its own key)
    # PKCS12 aliases are case-insensitive (stored folded to lowercase) —
    # the reason the reference documents keystore keys as lowercase-only.
    # Reject mixed case up front instead of silently folding on read-back.
    bad = [k for k in secrets if k != k.lower()]
    if bad:
        raise ValueError(
            f"keystore keys must be lowercase (PKCS12 aliases are "
            f"case-insensitive): {bad}")
    all_secrets = dict(secrets)
    all_secrets[MARKER_KEY] = base64.b64encode(
        MARKER_KEY.encode()).decode("ascii")
    for key, value in all_secrets.items():
        b64 = base64.b64encode(value.encode("utf-8")).decode("ascii")
        spec = jvm.javax.crypto.spec.PBEKeySpec(_chars(gw, jvm, b64))
        secret_key = factory.generateSecret(spec)
        ks.setEntry(f"urn:logstash:secret:v1:{key}",
                    entry_cls(secret_key), protection)
    fos = jvm.java.io.FileOutputStream(path)
    try:
        ks.store(fos, _chars(gw, jvm, pw))
    finally:
        fos.close()
    if use_default:
        trailer = _obfuscate(pw)
        with open(path, "ab") as f:
            f.write(trailer + bytes([len(trailer)]))
