"""Remote source resolution: credentials/endpoint config → Hadoop FS conf.

Reference parity for the per-protocol source implementations
(pkg/source/config.go:4-14 and the per-source option structs):

  S2 S3    pkg/source/s3.go:16-24    endpoint/region/keys/token/bucket/key
  S3 OSS   pkg/source/oss.go:15-21   endpoint/keys/bucket/key
  S4 FTP   pkg/source/ftp.go:13-19   host/port/user/password/path
  S5 SFTP  pkg/source/sftp.go:15-24  host/port/user/password/key/passphrase
  S6 HDFS  pkg/source/hdfs.go:24-36  address/user/kerberos (keytab/ccache)
  S7 GCS   pkg/source/gcs.go:15-22   endpoint/credentials file|json|anon

The Go tool opens one byte stream per object; Spark's Hadoop FS connectors
replace that client plane, so each options block resolves to (URI, conf):
the URI is what ``spark.read`` loads and the conf entries land on the
session's ``hadoopConfiguration`` BEFORE the scan is planned. S3/OSS creds
use per-bucket ``fs.s3a.bucket.<name>.*`` keys so two sources with
different credentials coexist in one session.

FTP/SFTP have no Hadoop FS: they resolve by DOWNLOADING to a local staging
dir (ftplib stdlib / paramiko if installed) and returning a ``file:`` URI —
the reference streams these single-file sources through one reader anyway
(no parallel scan to lose). At 100 TB you would not serve data over FTP;
the shim exists for config compatibility.

Kerberos note: an already-running JVM cannot switch KRB5 config; the
keytab/principal pair must go to ``spark-submit --keytab --principal``.
``resolve()`` still returns those entries (prefixed ``submit.``) so a
launcher (tools/submit.py) can forward them, and applies the in-session
ones (``dfs.data.transfer.protection``, auth mode).
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import SparkSession


class RemoteConfigError(ValueError):
    pass


@dataclass
class S3Options:
    """Reference pkg/source/s3.go:16-24."""

    bucket: str
    key: str
    endpoint: str | None = None
    region: str | None = None
    access_key_id: str | None = None
    access_key_secret: str | None = None
    token: str | None = None

    def resolve(self) -> tuple[str, dict[str, str]]:
        if not self.bucket or not self.key:
            raise RemoteConfigError("s3 source requires bucket and key")
        p = f"fs.s3a.bucket.{self.bucket}"
        conf: dict[str, str] = {
            # reference forces path-style addressing (s3.go:47 S3ForcePathStyle)
            f"{p}.path.style.access": "true",
        }
        if self.endpoint:
            conf[f"{p}.endpoint"] = self.endpoint
        if self.region:
            conf[f"{p}.endpoint.region"] = self.region
        if self.access_key_id:
            conf[f"{p}.access.key"] = self.access_key_id
        if self.access_key_secret:
            conf[f"{p}.secret.key"] = self.access_key_secret
        if self.token:
            conf[f"{p}.session.token"] = self.token
            conf[f"{p}.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
            )
        return f"s3a://{self.bucket}/{self.key.lstrip('/')}", conf


@dataclass
class OSSOptions:
    """Reference pkg/source/oss.go:15-21. Alibaba OSS speaks the S3 API at
    its -internal/compat endpoints; map onto the same per-bucket s3a keys."""

    bucket: str
    key: str
    endpoint: str | None = None
    access_key_id: str | None = None
    access_key_secret: str | None = None

    def resolve(self) -> tuple[str, dict[str, str]]:
        uri, conf = S3Options(
            bucket=self.bucket,
            key=self.key,
            endpoint=self.endpoint,
            access_key_id=self.access_key_id,
            access_key_secret=self.access_key_secret,
        ).resolve()
        return uri, conf


@dataclass
class GCSOptions:
    """Reference pkg/source/gcs.go:15-22."""

    bucket: str
    key: str
    endpoint: str | None = None
    credentials_file: str | None = None
    credentials_json: str | None = None
    without_authentication: bool = False

    def resolve(self) -> tuple[str, dict[str, str]]:
        if not self.bucket or not self.key:
            raise RemoteConfigError("gcs source requires bucket and key")
        conf: dict[str, str] = {}
        if self.endpoint:
            conf["fs.gs.storage.root.url"] = self.endpoint
        if self.credentials_file:
            conf["fs.gs.auth.type"] = "SERVICE_ACCOUNT_JSON_KEYFILE"
            conf["fs.gs.auth.service.account.json.keyfile"] = self.credentials_file
        elif self.credentials_json:
            # connector wants a file; stage the inline JSON (reference
            # gcs.go:48-49 WithCredentialsJSON)
            f = tempfile.NamedTemporaryFile(
                "w", suffix=".json", prefix="gcs-cred-", delete=False
            )
            f.write(self.credentials_json)
            f.close()
            os.chmod(f.name, 0o600)
            conf["fs.gs.auth.type"] = "SERVICE_ACCOUNT_JSON_KEYFILE"
            conf["fs.gs.auth.service.account.json.keyfile"] = f.name
        elif self.without_authentication:
            conf["fs.gs.auth.type"] = "UNAUTHENTICATED"
        return f"gs://{self.bucket}/{self.key.lstrip('/')}", conf


@dataclass
class HDFSOptions:
    """Reference pkg/source/hdfs.go:24-36."""

    address: str
    path: str
    user: str | None = None
    service_principal_name: str | None = None
    krb5_config_file: str | None = None
    ccache_file: str | None = None
    keytab_file: str | None = None
    password: str | None = None
    data_transfer_protection: str | None = None

    def resolve(self) -> tuple[str, dict[str, str]]:
        if not self.address or not self.path:
            raise RemoteConfigError("hdfs source requires address and path")
        conf: dict[str, str] = {}
        if self.user:
            # simple-auth identity (reference hdfs.go: client user option)
            conf["env.HADOOP_USER_NAME"] = self.user
        if self.service_principal_name or self.keytab_file or self.ccache_file:
            conf["hadoop.security.authentication"] = "kerberos"
            # JVM-start-time settings a launcher must forward to spark-submit
            if self.keytab_file:
                conf["submit.spark.kerberos.keytab"] = self.keytab_file
            if self.service_principal_name:
                conf["submit.spark.kerberos.principal"] = self.service_principal_name
            if self.krb5_config_file:
                conf["submit.java.security.krb5.conf"] = self.krb5_config_file
            if self.ccache_file:
                conf["submit.KRB5CCNAME"] = self.ccache_file
        if self.data_transfer_protection:
            conf["dfs.data.transfer.protection"] = self.data_transfer_protection
        addr = self.address if "://" in self.address else f"hdfs://{self.address}"
        return f"{addr.rstrip('/')}/{self.path.lstrip('/')}", conf


@dataclass
class FTPOptions:
    """Reference pkg/source/ftp.go:13-19 — staged download, no Hadoop FS."""

    host: str
    path: str
    port: int = 21
    user: str = "anonymous"
    password: str = ""

    def download(self, dest_dir: str) -> str:
        import ftplib

        out = Path(dest_dir) / Path(self.path).name
        ftp = ftplib.FTP()
        ftp.connect(self.host, self.port, timeout=5)  # ftp.go:40 5s timeout
        try:
            ftp.login(self.user, self.password)
            with open(out, "wb") as fh:
                ftp.retrbinary(f"RETR {self.path}", fh.write)
        finally:
            ftp.quit()
        return str(out)


@dataclass
class SFTPOptions:
    """Reference pkg/source/sftp.go:15-24 — staged download via paramiko
    (optional dependency; a clear error if absent)."""

    host: str
    path: str
    port: int = 22
    user: str = ""
    password: str | None = None
    key_file: str | None = None
    key_data: str | None = None
    passphrase: str | None = None

    def download(self, dest_dir: str) -> str:
        try:
            import paramiko
        except ImportError as e:  # pragma: no cover — not in the sandbox
            raise RemoteConfigError(
                "sftp sources require the 'paramiko' package"
            ) from e
        out = Path(dest_dir) / Path(self.path).name
        kwargs: dict = {"username": self.user}
        if self.key_data or self.key_file:
            import io

            # any key type, like the reference's ssh.ParsePrivateKey
            # (pkg/source/sftp.go) — try each paramiko class in turn.
            # DSSKey via getattr: paramiko >= 4 removed DSA support.
            text = self.key_data or Path(self.key_file).read_text()
            classes = [
                cls
                for cls in (
                    paramiko.Ed25519Key,
                    paramiko.ECDSAKey,
                    paramiko.RSAKey,
                    getattr(paramiko, "DSSKey", None),
                )
                if cls is not None
            ]
            errors: list[Exception] = []
            for cls in classes:
                try:
                    kwargs["pkey"] = cls.from_private_key(
                        io.StringIO(text), password=self.passphrase
                    )
                    break
                except paramiko.PasswordRequiredException as e:
                    # the key parsed far enough to know it is encrypted —
                    # report the passphrase problem, not a format guess
                    from nebula_importer_spark.sources.reader import SourceError

                    raise SourceError(
                        f"sftp: private key needs a passphrase ({e})"
                    ) from e
                except paramiko.SSHException as e:
                    errors.append(e)
            else:
                from nebula_importer_spark.sources.reader import SourceError

                detail = "; ".join(
                    f"{c.__name__}: {e}" for c, e in zip(classes, errors)
                )
                raise SourceError(f"sftp: unreadable private key ({detail})")
        elif self.password is not None:
            kwargs["password"] = self.password
        cli = paramiko.SSHClient()
        cli.set_missing_host_key_policy(paramiko.AutoAddPolicy())
        cli.connect(self.host, port=self.port, timeout=5, **kwargs)
        try:
            sftp = cli.open_sftp()
            sftp.get(self.path, str(out))
        finally:
            cli.close()
        return str(out)


def apply_hadoop_conf(spark: SparkSession, conf: dict[str, str]) -> None:
    """Apply resolved conf entries to the live session. ``submit.*`` keys
    need the JVM launcher and are skipped here (tools/submit.py forwards
    them); ``env.*`` keys set process env vars read by the Hadoop client."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        if k.startswith("submit."):
            continue
        if k.startswith("env."):
            os.environ[k[len("env.") :]] = v
            continue
        hconf.set(k, v)


def resolve_remote(spark: SparkSession, spec, staging_dir: str | None = None) -> str:
    """Resolve a SourceSpec's remote block (if any) to a readable URI,
    applying credential conf / staging downloads as needed. Returns the
    spec's plain path when no remote block is set."""
    for attr in ("s3", "oss", "gcs", "hdfs"):
        opts = getattr(spec, attr, None)
        if opts is not None:
            uri, conf = opts.resolve()
            apply_hadoop_conf(spark, conf)
            return uri
    for attr in ("ftp", "sftp"):
        opts = getattr(spec, attr, None)
        if opts is not None:
            dest = staging_dir or tempfile.mkdtemp(prefix="nispark-remote-")
            return opts.download(dest)
    return spec.path
