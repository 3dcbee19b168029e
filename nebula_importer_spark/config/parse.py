"""Config loading: dict / JSON / YAML → GraphConfig.

Accepts the reference's v3 YAML shape (reference pkg/config/config.go:26-74:
JSON accepted and converted, version-dispatched) plus our parquet/json source
extension. Keys are camelCase as in the reference config surface.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from nebula_importer_spark.config.model import (
    ConfigError,
    CsvOptions,
    EdgeSpec,
    GraphConfig,
    HookSpec,
    LogSpec,
    Mode,
    NodeIDSpec,
    NodeSpec,
    PropSpec,
    SourceSpec,
)

_DURATION_UNITS = {"ns": 1e-9, "us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}


def _duration_sec(v: Any) -> float:
    """Parse a Go-style duration — composite terms like '1m30s' or
    '1h10m500ms' included, matching time.ParseDuration — or a bare number
    of seconds (reference hook wait is a time.Duration YAML string).
    Malformed values raise ConfigError (the CLI's one-line error path)."""
    import re as _re

    if v is None:
        return 0.0
    if isinstance(v, (int, float)):
        return float(v)
    s = str(v).strip()
    try:
        return float(s)  # bare seconds
    except ValueError:
        pass
    terms = _re.findall(r"(\d+(?:\.\d+)?)(ms|us|ns|h|m|s)", s)
    if not terms or "".join(n + u for n, u in terms) != s.lstrip("+"):
        raise ConfigError(f"invalid duration {v!r} (expected e.g. '10s', '1m30s')")
    return sum(float(n) * _DURATION_UNITS[u] for n, u in terms)


def _prop(d: dict[str, Any]) -> PropSpec:
    return PropSpec(
        name=d["name"],
        type=str(d.get("type", "STRING")).upper(),
        index=int(d.get("index", 0)),
        nullable=bool(d.get("nullable", False)),
        null_value=str(d.get("nullValue", "")),
        alternative_indices=[int(i) for i in d.get("alternativeIndices", [])],
        default_value=None if d.get("defaultValue") is None else str(d["defaultValue"]),
    )


def _node_id(d: dict[str, Any], name: str = "id") -> NodeIDSpec:
    return NodeIDSpec(
        name=d.get("name", name),
        type=str(d.get("type", "STRING")).upper(),
        index=None if d.get("index") is None else int(d["index"]),
        concat_items=list(d.get("concatItems", [])),
        function=d.get("function"),
    )


def _filter_expr(d: dict[str, Any]) -> str | None:
    f = d.get("filter")
    if f is None:
        return None
    if isinstance(f, str):
        return f
    return f.get("expr")


def _node(d: dict[str, Any]) -> NodeSpec:
    return NodeSpec(
        name=d["name"],
        id=_node_id(d["id"]),
        props=[_prop(p) for p in d.get("props", [])],
        filter=_filter_expr(d),
        mode=Mode(str(d.get("mode", "INSERT")).upper()),
        ignore_existed_index=bool(d.get("ignoreExistedIndex", True)),
    )


def _edge(d: dict[str, Any]) -> EdgeSpec:
    # src/dst may be {"id": {...}} (reference shape) or the id dict directly.
    src = d["src"].get("id", d["src"])
    dst = d["dst"].get("id", d["dst"])
    rank = d.get("rank")
    rank_index = None if rank is None else int(rank.get("index", 0) if isinstance(rank, dict) else rank)
    return EdgeSpec(
        name=d["name"],
        src=_node_id(src, "src"),
        dst=_node_id(dst, "dst"),
        rank_index=rank_index,
        props=[_prop(p) for p in d.get("props", [])],
        filter=_filter_expr(d),
        mode=Mode(str(d.get("mode", "INSERT")).upper()),
        ignore_existed_index=bool(d.get("ignoreExistedIndex", True)),
    )


def _csv(d: dict[str, Any] | None) -> CsvOptions:
    d = d or {}
    return CsvOptions(
        delimiter=d.get("delimiter", ","),
        with_header=bool(d.get("withHeader", False)),
        lazy_quotes=bool(d.get("lazyQuotes", False)),
        comment=d.get("comment"),
    )


def _remote_blocks(d: dict[str, Any]) -> dict[str, Any]:
    """Per-protocol remote source blocks (reference pkg/source/config.go:4-14),
    camelCase keys as in the reference YAML surface."""
    from nebula_importer_spark.sources.remote import (
        FTPOptions,
        GCSOptions,
        HDFSOptions,
        OSSOptions,
        S3Options,
        SFTPOptions,
    )

    out: dict[str, Any] = {}
    if "s3" in d:
        s = d["s3"]
        out["s3"] = S3Options(
            bucket=s.get("bucket", ""), key=s.get("key", ""),
            endpoint=s.get("endpoint"), region=s.get("region"),
            access_key_id=s.get("accessKeyID"),
            access_key_secret=s.get("accessKeySecret"), token=s.get("token"),
        )
    if "oss" in d:
        s = d["oss"]
        out["oss"] = OSSOptions(
            bucket=s.get("bucket", ""), key=s.get("key", ""),
            endpoint=s.get("endpoint"), access_key_id=s.get("accessKeyID"),
            access_key_secret=s.get("accessKeySecret"),
        )
    if "gcs" in d:
        s = d["gcs"]
        out["gcs"] = GCSOptions(
            bucket=s.get("bucket", ""), key=s.get("key", ""),
            endpoint=s.get("endpoint"),
            credentials_file=s.get("credentialsFile"),
            credentials_json=s.get("credentialsJSON"),
            without_authentication=bool(s.get("withoutAuthentication", False)),
        )
    if "hdfs" in d:
        s = d["hdfs"]
        out["hdfs"] = HDFSOptions(
            address=s.get("address", ""), path=s.get("path", ""),
            user=s.get("user"),
            service_principal_name=s.get("servicePrincipalName"),
            krb5_config_file=s.get("krb5ConfigFile"),
            ccache_file=s.get("ccacheFile"), keytab_file=s.get("keyTabFile"),
            password=s.get("password"),
            data_transfer_protection=s.get("dataTransferProtection"),
        )
    if "ftp" in d:
        s = d["ftp"]
        out["ftp"] = FTPOptions(
            host=s.get("host", ""), path=s.get("path", ""),
            port=int(s.get("port", 21)), user=s.get("user", "anonymous"),
            password=s.get("password", ""),
        )
    if "sftp" in d:
        s = d["sftp"]
        out["sftp"] = SFTPOptions(
            host=s.get("host", ""), path=s.get("path", ""),
            port=int(s.get("port", 22)), user=s.get("user", ""),
            password=s.get("password"), key_file=s.get("keyFile"),
            key_data=s.get("keyData"), passphrase=s.get("passphrase"),
        )
    return out


def _source(d: dict[str, Any], base_dir: Path | None) -> SourceSpec:
    path = d.get("path", "")
    if path and base_dir is not None and not Path(path).is_absolute() and "://" not in path:
        # Relative-path resolution against the config file, mirroring
        # reference cfg.Optimize (pkg/config/v3/config.go:31-50).
        path = str((base_dir / path).resolve())
    return SourceSpec(
        path=path,
        csv=_csv(d.get("csv")),
        format=d.get("format", "csv"),
        batch=None if d.get("batch") is None else int(d["batch"]),
        tags=[_node(t) for t in d.get("tags", [])],
        edges=[_edge(e) for e in d.get("edges", [])],
        **_remote_blocks(d),
    )


def config_from_dict(d: dict[str, Any], base_dir: Path | None = None) -> GraphConfig:
    # Version dispatch (reference pkg/config/config.go:26-46): a config that
    # declares a client version we do not implement must ERROR, not silently
    # run with v3 semantics. Absent client/version defaults to v3.
    version = str((d.get("client") or {}).get("version", "v3")).lower()
    if version != "v3":
        raise ConfigError(f"unsupported config version {version!r} (supported: v3)")
    if (d.get("client") or {}).get("ssl") is not None:
        # client.ssl (reference pkg/config/base/client.go:32-40) configures
        # the graphd TLS channel; this engine's sink is the TableStore, so
        # there is no channel to secure — accept the block (reference
        # example configs keep parsing) and note that it is inert here.
        import logging

        logging.getLogger("nebula_importer_spark").info(
            "client.ssl block accepted but inert: no graphd connection in "
            "this engine (statements render to files; sink is the table store)"
        )
    mgr = d.get("manager", {})
    hooks = mgr.get("hooks", {})

    def _hooks(key: str) -> list[HookSpec]:
        out: list[HookSpec] = []
        for h in hooks.get(key, []) or []:
            if isinstance(h, dict):
                out.append(
                    HookSpec(
                        statements=list(h.get("statements", [])),
                        wait_sec=_duration_sec(h.get("wait")),
                    )
                )
            else:
                out.append(HookSpec(statements=[str(h)]))
        return out

    log_spec = None
    if isinstance(d.get("log"), dict):
        lg = d["log"]
        log_spec = LogSpec(
            level=lg.get("level"),
            console=bool(lg.get("console", True)),
            # relative log files resolve against the config file's dir
            # (reference Log.OptimizePath, pkg/config/base/log.go:18-29)
            files=[
                str(
                    (base_dir / f)
                    if base_dir is not None and not Path(f).is_absolute()
                    else Path(f)
                )
                for f in (lg.get("files") or [])
            ],
            fields=dict(lg.get("fields") or {}),
        )

    def _opt_int(key: str) -> int | None:
        v = mgr.get(key)
        return None if v is None else int(v)

    cfg = GraphConfig(
        space=mgr.get("spaceName", d.get("space", "default")),
        sources=[_source(s, base_dir) for s in d.get("sources", [])],
        before_hooks=_hooks("before"),
        after_hooks=_hooks("after"),
        batch=int(mgr.get("batch", 128)),
        stats_interval_sec=_duration_sec(mgr.get("statsInterval", 10.0)),
        reader_concurrency=_opt_int("readerConcurrency"),
        importer_concurrency=_opt_int("importerConcurrency"),
        log=log_spec,
    )
    cfg.validate()
    return cfg


def load_config(path: str | Path) -> GraphConfig:
    """Load YAML or JSON config file (reference pkg/config/config.go:57-74)."""
    p = Path(path)
    text = p.read_text()
    data: Any
    if p.suffix == ".json":
        data = json.loads(text)
    else:
        try:
            import yaml  # optional dep; baked into this env
        except ImportError as e:  # pragma: no cover
            raise ConfigError("YAML config requires pyyaml; use JSON or dict") from e

        # Date/datetime scalars in importer configs are STRING values
        # (defaultValue: 0000-00-00T00:00:00 in the reference's own
        # examples — year 0 doesn't even construct in Python): drop
        # PyYAML's implicit timestamp resolution so they load verbatim,
        # matching the Go yaml.v3 behavior for string-typed fields.
        class _Loader(yaml.SafeLoader):
            pass

        _Loader.yaml_implicit_resolvers = {
            key: [
                (tag, regexp)
                for tag, regexp in resolvers
                if tag != "tag:yaml.org,2002:timestamp"
            ]
            for key, resolvers in yaml.SafeLoader.yaml_implicit_resolvers.items()
        }
        data = yaml.load(text, Loader=_Loader)
    if not isinstance(data, dict):
        raise ConfigError(f"config {path}: expected a mapping at top level")
    return config_from_dict(data, base_dir=p.parent)
