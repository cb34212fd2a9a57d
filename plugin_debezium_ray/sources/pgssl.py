"""Postgres SSL property handling — the `PostgresService` surface.

Mirrors `/root/reference/plugin-debezium-postgres/src/main/java/io/kestra/
plugin/debezium/postgres/PostgresService.java:30-127`:

- ``sslMode`` enum → ``database.sslmode`` (upper-case, ``_`` → ``-``).
- ``sslRootCert`` / ``sslCert`` PEM strings → temp ``.pem`` files whose
  paths land in ``database.sslrootcert`` / ``database.sslcert``.
- ``sslKey`` PEM private key → **PKCS8 DER** temp file
  (``database.sslkey``): a traditional PKCS1 ``RSA PRIVATE KEY`` is
  wrapped into the PKCS8 envelope with a pure-DER transform (the
  reference uses BouncyCastle for the same conversion, `:92-127`); a
  ``PRIVATE KEY`` block (already PKCS8) is just base64-decoded.
- Encrypted keys without a password fail with the reference's message
  (`:100-103`); WITH a password the key is decrypted via the
  ``cryptography`` library (the BouncyCastle role, `:92-127`) — both
  traditional ``DEK-Info`` PEM and PKCS8 PBES2 ``ENCRYPTED PRIVATE
  KEY`` — and re-emitted as unencrypted PKCS8 DER.  A wrong password
  surfaces as ``ValueError``; environments without the library fall
  back to an honest ``NotImplementedError``.

No live databases exist in this sandbox, so these feed the connector
property plan only — but the PEM parsing / PKCS8 wrapping is genuine
and tested against a known key fixture.
"""

from __future__ import annotations

import base64
import os
import re
import tempfile

SSL_MODES = ("DISABLE", "ALLOW", "PREFER", "REQUIRE", "VERIFY_CA", "VERIFY_FULL")

_PEM_RE = re.compile(
    r"-----BEGIN (?P<label>[A-Z0-9 ]+)-----(?P<body>.*?)-----END (?P=label)-----",
    re.S,
)

# DER for AlgorithmIdentifier { rsaEncryption (1.2.840.113549.1.1.1), NULL }
_RSA_ALG_ID = bytes.fromhex("300d06092a864886f70d0101010500")


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(raw)]) + raw


def _der_tlv(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _der_len(len(content)) + content


def parse_pem(text: str) -> tuple[str, bytes, dict]:
    """First PEM block → (label, DER bytes, headers)."""
    m = _PEM_RE.search(text)
    if m is None:
        raise ValueError("no PEM block found")
    body = m.group("body")
    headers: dict[str, str] = {}
    b64_lines = []
    for line in body.strip().splitlines():
        line = line.strip()
        if ":" in line and not _is_b64(line):
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        elif line:
            b64_lines.append(line)
    return m.group("label"), base64.b64decode("".join(b64_lines)), headers


def _is_b64(line: str) -> bool:
    return re.fullmatch(r"[A-Za-z0-9+/=]+", line) is not None


def pkcs1_to_pkcs8(pkcs1_der: bytes) -> bytes:
    """Wrap a traditional RSAPrivateKey DER in the PKCS8
    PrivateKeyInfo envelope (pure DER, no crypto needed):
    SEQ { INTEGER 0, AlgId(rsaEncryption), OCTET STRING <pkcs1> }."""
    version = _der_tlv(0x02, b"\x00")
    key_octets = _der_tlv(0x04, pkcs1_der)
    return _der_tlv(0x30, version + _RSA_ALG_ID + key_octets)


def convert_private_key(pem_text: str, password: str | None = None) -> bytes:
    """PEM private key → PKCS8 DER bytes (PostgresService.convertPrivateKey)."""
    label, der, headers = parse_pem(pem_text)
    encrypted = (
        label == "ENCRYPTED PRIVATE KEY"
        or "ENCRYPTED" in headers.get("Proc-Type", "")
    )
    if encrypted:
        if password is None:
            # PostgresService.java:100-103 message, verbatim contract
            raise ValueError(
                "Unable to import private key. Key is encrypted, but no "
                "password was provided."
            )
        # decrypt with `cryptography` (the BouncyCastle role in
        # PostgresService.java:92-127): covers both the traditional
        # DEK-Info encrypted PEM and PKCS8 PBES2 ENCRYPTED PRIVATE KEY.
        # Gated behind import-try so environments without the library
        # still get the honest NotImplementedError.
        try:
            from cryptography.hazmat.primitives import serialization
        except ImportError:  # pragma: no cover - library is present here
            raise NotImplementedError(
                "encrypted-key decryption needs the `cryptography` "
                "library (the reference uses BouncyCastle); provide the "
                "key unencrypted"
            ) from None
        try:
            key = serialization.load_pem_private_key(
                pem_text.encode(), password=password.encode()
            )
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"Unable to import private key: {e}"
            ) from e
        return key.private_bytes(
            serialization.Encoding.DER,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        )
    if label == "RSA PRIVATE KEY":  # PKCS1 → PKCS8
        return pkcs1_to_pkcs8(der)
    if label == "PRIVATE KEY":  # already PKCS8
        return der
    raise ValueError(f"unsupported PEM label {label!r} for a private key")


def handle_ssl_properties(
    props: dict,
    *,
    ssl_mode: str | None = None,
    ssl_root_cert: str | None = None,
    ssl_cert: str | None = None,
    ssl_key: str | None = None,
    ssl_key_password: str | None = None,
    workdir: str | None = None,
) -> dict:
    """Fold the SSL task properties into the connector property plan
    (PostgresService.handleProperties:40-73).  PEM materials are written
    to temp files; the key is converted to PKCS8 DER."""
    if ssl_mode is not None:
        mode = ssl_mode.strip().upper()
        if mode not in SSL_MODES:
            raise ValueError(f"unknown sslMode {ssl_mode!r}; one of {SSL_MODES}")
        props["database.sslmode"] = mode.replace("_", "-")
    wd = workdir or tempfile.mkdtemp(prefix="pgssl_", dir="/tmp")
    os.makedirs(wd, exist_ok=True)

    def _write(name: str, data: bytes) -> str:
        path = os.path.join(wd, name)
        with open(path, "wb") as f:
            f.write(data)
        return path

    if ssl_root_cert is not None:
        parse_pem(ssl_root_cert)  # validate it IS a PEM
        props["database.sslrootcert"] = _write(
            "root.pem", ssl_root_cert.encode()
        )
    if ssl_cert is not None:
        parse_pem(ssl_cert)
        props["database.sslcert"] = _write("cert.pem", ssl_cert.encode())
    if ssl_key is not None:
        props["database.sslkey"] = _write(
            "key.der", convert_private_key(ssl_key, ssl_key_password)
        )
    if ssl_key_password is not None:
        props["database.sslpassword"] = ssl_key_password
    return props
