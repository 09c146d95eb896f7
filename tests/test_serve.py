"""Serving daemon: resident fold-vmapped ensemble scoring over HTTP."""
import argparse
import json
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.cli import score, serve, train_supervised
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


@pytest.fixture(scope="module")
def trained_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_project")
    make_synthetic_resource(root, "ADNI", n_hc=60, n_disease={0: 30},
                            effect=1.2)
    train_args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SM-av45", combine="PoE", epochs=30, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(train_args, project_root=root)
    return root


@pytest.fixture(scope="module")
def service(trained_project):
    return serve.ScoringService("ADNI", "SM-av45", combine="PoE",
                                n_splits=2, project_root=trained_project)


def test_service_matches_score_cli(trained_project, service):
    """The daemon's one vmapped ensemble program must reproduce
    cli/score.py's per-fold loop (same scalers, covariate binning, PRNG
    streams) up to on-device float32 scaling."""
    root = trained_project
    y = pd.read_csv(root / "data" / "ADNI" / "y.csv")
    ids_path = root / "serve_ids.csv"
    y[["IID"]].to_csv(ids_path, index=False)
    score_args = argparse.Namespace(
        dataset_resourse="ADNI", procedure="SM-av45", combine="PoE",
        n_splits=2, ids=str(ids_path), fold=None, output=None,
        roi_output=None, seed=42)
    expected = score.score(score_args, project_root=root)

    # request in score.py's row order so the per-fold PRNG streams align
    # subject-for-subject (sampling is positional within the batch)
    out = service.score_ids(list(expected["participant_id"]), roi=True)
    np.testing.assert_allclose(out["deviation"],
                               expected["deviation"].values, rtol=2e-4)
    assert out["participant_id"] == list(expected["participant_id"])
    assert list(out["per_modality"]) == ["av45"]
    assert len(out["roi_columns"]) == 90
    assert np.isfinite(np.asarray(out["roi"])).all()

    # disease subjects still separate from HC through the daemon
    merged = pd.DataFrame({"participant_id": out["participant_id"],
                           "deviation": out["deviation"]}).merge(
        y, left_on="participant_id", right_on="IID")
    assert (merged[merged["DIA"] == 0]["deviation"].mean()
            > merged[merged["DIA"] == 2]["deviation"].mean())


def test_raw_payload_matches_ids_mode(service):
    """Raw feature payloads (no project-table lookup) must score
    identically to the same subjects resolved by id."""
    ids = list(service._frames[0].index[:5])
    by_id = service.score_ids(ids)

    rows = service._frames[0].loc[ids]
    raw = service.score_raw(
        {"av45": rows[service.columns[0]].to_numpy(float).tolist()},
        {"AGE": rows["AGE"].tolist(), "PTGENDER": rows["PTGENDER"].tolist()},
    )
    np.testing.assert_allclose(raw["deviation"], by_id["deviation"],
                               rtol=1e-6)

    # single-fold scoring is a strict subset of the same program's output
    one_fold = service.score_ids(ids, fold=1)
    assert one_fold["n_folds"] == 1
    assert not np.allclose(one_fold["deviation"], by_id["deviation"])


def test_latent_scoring_matches_sequential_oracle(trained_project, service):
    """Latent deviation through the daemon's fold-vmapped program must match
    a per-fold sequential path built independently from the raw model and
    infer.deviation's numpy utilities (utils_vae.py:155-161 semantics)."""
    from multi_modal_normative_modeling_tpu.cli import common
    from multi_modal_normative_modeling_tpu.data.preprocess import (
        train_binned_covariates,
    )
    from multi_modal_normative_modeling_tpu.infer.deviation import (
        latent_deviation,
        separate_latent_deviation,
    )

    root = trained_project
    ids = list(service._frames[0].index[:7])
    rows = service._frames[0].loc[ids]
    feats = rows[service.columns[0]].to_numpy(np.float32)
    # latent statistics are computed lazily on the first latent request,
    # keeping recon-only startups free of the extra compile + train encode
    assert service.state.latent_mean is None
    got = service.score_raw(
        {"av45": feats.tolist()},
        {"AGE": rows["AGE"].tolist(), "PTGENDER": rows["PTGENDER"].tolist()},
        latent=True)

    kfold = root / "outputs" / "kfold_analysis"
    participants = root / "data" / "ADNI" / "y.csv"
    scalars, zs = [], []
    for fold in range(2):
        model, params, _ = common.load_model_and_params(
            kfold / "supervised_cvae" / f"{fold:03d}")
        prep = common.prepare_modality(
            root, "ADNI", "av45", participants,
            kfold / f"train_ids_{fold:03d}.csv")
        mu_train, _ = model.latent_stats(
            params, [prep["train_data"]], [prep["train_cov"]], "PoE")
        x = ((feats - np.asarray(prep["scaler"].center, np.float32))
             / np.asarray(prep["scaler"].scale, np.float32))
        cov = train_binned_covariates(
            prep["train_df"][["AGE", "PTGENDER"]],
            rows[["AGE", "PTGENDER"]]).astype(np.float32)
        mu_s, var_s = model.latent_stats(params, [x], [cov], "PoE")
        mu_train, mu_s, var_s = (np.asarray(a)
                                 for a in (mu_train, mu_s, var_s))
        scalars.append(latent_deviation(mu_train, mu_s, var_s))
        zs.append(separate_latent_deviation(mu_train, mu_s, var_s))

    np.testing.assert_allclose(got["latent_deviation"],
                               np.mean(scalars, axis=0),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got["latent_per_dim"], np.mean(zs, axis=0),
                               rtol=1e-4, atol=1e-6)
    # single-fold selection picks that fold's z-scores
    one = service.score_raw(
        {"av45": feats.tolist()},
        {"AGE": rows["AGE"].tolist(), "PTGENDER": rows["PTGENDER"].tolist()},
        latent=True, fold=1)
    np.testing.assert_allclose(one["latent_deviation"], scalars[1],
                               rtol=1e-4, atol=1e-6)
    # latent scoring is deterministic (no sampling): repeat call identical
    again = service.score_ids(ids, latent=True)
    np.testing.assert_array_equal(again["latent_deviation"],
                                  got["latent_deviation"])


def test_latent_unavailable_for_dmvae(tmp_path):
    """A split-latent variant (no deterministic fused latent) still serves
    reconstruction deviation but refuses latent requests with a clear
    error, and advertises that in /healthz."""
    make_synthetic_resource(tmp_path, "ADNI", n_hc=40, n_disease={0: 10},
                            effect=1.2)
    train_args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SM-av45", combine="PoE", epochs=3, n_splits=2,
        oversample_percentage=1, model="DMVAE",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(train_args, project_root=tmp_path)
    svc = serve.ScoringService("ADNI", "SM-av45", combine="PoE",
                               n_splits=2, project_root=tmp_path)
    assert svc.health()["latent_scoring"] is False
    ids = list(svc._frames[0].index[:3])
    assert len(svc.score_ids(ids)["deviation"]) == 3  # recon path works
    with pytest.raises(serve.ServeError, match="latent"):
        svc.score_ids(ids, latent=True)


def test_request_validation(service):
    with pytest.raises(serve.ServeError, match="unknown participant"):
        service.score_ids(["nope"])
    with pytest.raises(serve.ServeError, match="empty"):
        service.score_ids([])
    with pytest.raises(serve.ServeError, match="expected"):
        service.score_raw({"av45": [[1.0, 2.0]]},
                          {"AGE": [70], "PTGENDER": [1]})
    with pytest.raises(serve.ServeError, match="fold"):
        service.score_ids(list(service._frames[0].index[:1]), fold=7)


def test_http_surface(service):
    """Drive the real HTTP server: health, ids scoring, raw scoring, and
    client-error mapping."""
    server = serve.make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        with urllib.request.urlopen(base + "/healthz") as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["modalities"] == ["av45"]
        assert health["n_folds"] == 2
        assert health["latent_scoring"] is True

        ids = list(service._frames[0].index[:3])
        status, body = post("/score", {"ids": ids})
        assert status == 200
        assert len(body["deviation"]) == 3

        status, body = post("/score", {"ids": ids, "latent": True})
        assert status == 200
        np.testing.assert_allclose(
            body["latent_deviation"],
            service.score_ids(ids, latent=True)["latent_deviation"],
            rtol=1e-6)
        np.testing.assert_allclose(body["deviation"],
                                   service.score_ids(ids)["deviation"],
                                   rtol=1e-6)

        status, body = post("/score", {"ids": ["nope"]})
        assert status == 400 and "unknown participant" in body["error"]

        status, body = post("/score", {})
        assert status == 400 and "ids" in body["error"]

        status, _ = post("/nope", {})
        assert status == 404
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_meshed_service_matches_unmeshed(trained_project, service):
    """--mesh F,D shards the resident scoring program over a ('fold',
    'data') mesh; scores must match the single-device service (folds and
    rows are independent — pure scale-out)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    from multi_modal_normative_modeling_tpu.parallel import make_mesh

    meshed = serve.ScoringService(
        "ADNI", "SM-av45", combine="PoE", n_splits=2,
        project_root=trained_project, mesh=make_mesh(n_fold=2, n_data=4))
    assert meshed.health()["mesh"] == {"fold": 2, "data": 4}

    ids = list(service._frames[0].index[:7])
    plain = service.score_ids(ids, roi=True, latent=True)
    sharded = meshed.score_ids(ids, roi=True, latent=True)
    np.testing.assert_allclose(sharded["deviation"], plain["deviation"],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(sharded["roi"], plain["roi"],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(sharded["latent_deviation"],
                               plain["latent_deviation"],
                               rtol=1e-5, atol=1e-7)

    # fold-axis divisibility is validated up front
    with pytest.raises(SystemExit, match="not divisible"):
        serve.ScoringService("ADNI", "SM-av45", combine="PoE", n_splits=3,
                             project_root=trained_project,
                             mesh=make_mesh(n_fold=2, n_data=4))


def test_ep_meshed_service_matches_unmeshed(tmp_path):
    """--ep_mesh F,M,D serves the packed-modality program with per-modality
    experts sharded; scores match the unmeshed per-modality ensemble to
    fusion-reorder float tolerance, latent requests are a clean client
    error, and geometry gates fail loudly up front. This cohort is
    mixed-width (UCA), so the resident program rides the pad-free
    width-grouped layout (round 5) — /healthz reports it."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        make_ep_mesh3,
    )

    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=50, n_disease={0: 20},
                            effect=1.0, with_early_fusion=True)
    train_args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="UCA-gPoE", combine="gPoE", epochs=10, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(train_args, project_root=root)

    plain = serve.ScoringService("ADNI", "UCA-gPoE", combine="gPoE",
                                 n_splits=2, project_root=root)
    ep = serve.ScoringService("ADNI", "UCA-gPoE", combine="gPoE",
                              n_splits=2, project_root=root,
                              ep_mesh=make_ep_mesh3(2, 2, 2))
    assert ep.health()["mesh"] == {"fold": 2, "modality": 2, "data": 2}
    assert ep.health()["latent_scoring"] is False
    assert ep.health()["ep_layout"] == "width-grouped"  # mixed-width UCA
    assert plain.health()["ep_layout"] is None

    ids = list(plain._frames[0].index[:7])
    p = plain.score_ids(ids, roi=True)
    s = ep.score_ids(ids, roi=True)
    np.testing.assert_allclose(s["deviation"], p["deviation"],
                               rtol=2e-4, atol=1e-6)
    assert s["roi_columns"] == p["roi_columns"]
    np.testing.assert_allclose(s["roi"], p["roi"], rtol=2e-3, atol=1e-5)
    assert list(s["per_modality"]) == list(p["per_modality"])
    for name in p["per_modality"]:
        np.testing.assert_allclose(s["per_modality"][name],
                                   p["per_modality"][name],
                                   rtol=2e-4, atol=1e-6)

    with pytest.raises(serve.ServeError, match="ep_mesh"):
        ep.score_ids(ids, latent=True)

    # uniform-width cohorts keep the padded stacked layout (identical
    # math there; /healthz says which)
    se_root = root / "se"
    make_synthetic_resource(se_root, "ADNI", n_hc=50, n_disease={0: 20},
                            effect=1.0)
    se_args = argparse.Namespace(**{**vars(train_args),
                                    "procedure": "SE-PoE",
                                    "combine": "PoE"})
    train_supervised.main(se_args, project_root=se_root)
    se_plain = serve.ScoringService("ADNI", "SE-PoE", combine="PoE",
                                    n_splits=2, project_root=se_root)
    se_ep = serve.ScoringService(
        "ADNI", "SE-PoE", combine="PoE", n_splits=2, project_root=se_root,
        ep_mesh=make_ep_mesh3(1, 3, 2, devices=jax.devices()[:6]))
    assert se_ep.health()["ep_layout"] == "packed"
    ids2 = list(se_plain._frames[0].index[:5])
    np.testing.assert_allclose(se_ep.score_ids(ids2)["deviation"],
                               se_plain.score_ids(ids2)["deviation"],
                               rtol=2e-4, atol=1e-6)

    # modality-axis divisibility fails loudly at construction
    with pytest.raises(SystemExit, match="modalities not divisible"):
        serve.ScoringService("ADNI", "UCA-gPoE", combine="gPoE",
                             n_splits=2, project_root=root,
                             ep_mesh=make_ep_mesh3(1, 8, 1))
    with pytest.raises(ValueError, match="mutually exclusive"):
        from multi_modal_normative_modeling_tpu.parallel import make_mesh

        serve.ScoringService("ADNI", "UCA-gPoE", combine="gPoE",
                             n_splits=2, project_root=root,
                             mesh=make_mesh(n_fold=2, n_data=4),
                             ep_mesh=make_ep_mesh3(2, 2, 2))


def test_http_adversarial_payloads_never_kill_the_daemon(service):
    """Malformed/hostile requests get clean 4xx JSON errors (500 only for
    genuine surprises) and the daemon keeps serving afterwards."""
    import urllib.error

    server = serve.make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"

    def post_raw(data):
        req = urllib.request.Request(
            base + "/score", data=data,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    hostile = [
        b"",                                     # empty body
        b"not json at all {{{",                  # invalid JSON
        b"\x00\x01\x02",                         # binary garbage
        json.dumps({}).encode(),                 # neither ids nor features
        json.dumps({"ids": []}).encode(),        # empty ids
        json.dumps({"ids": ["no-such-subject"]}).encode(),
        json.dumps({"ids": [None, 1.5]}).encode(),
        json.dumps({"features": "wrong-type"}).encode(),
        json.dumps({"features": {"av45": [[1.0, 2.0]]},   # wrong width
                    "covariates": {"AGE": [70], "PTGENDER": [1]}}).encode(),
        json.dumps({"features": {"av45": [[0.1] * 90]},
                    "covariates": {"AGE": [70]}}).encode(),  # missing gender
        json.dumps({"features": {"av45": [[0.1] * 90]},
                    "covariates": {"AGE": [70, 71],          # length skew
                                   "PTGENDER": [1]}}).encode(),
        json.dumps({"ids": list(service._frames[0].index[:2]),
                    "fold": 99}).encode(),       # fold out of range
        json.dumps({"ids": list(service._frames[0].index[:2]),
                    "roi": {"nested": "junk"}}).encode(),
    ]
    try:
        for payload in hostile:
            status, body = post_raw(payload)
            assert "error" in body or status == 200, payload
            assert status in (200, 400), (payload, status, body)

        # the daemon is still alive and correct after the barrage
        ids = list(service._frames[0].index[:3])
        status, body = post_raw(json.dumps({"ids": ids}).encode())
        assert status == 200
        assert len(body["deviation"]) == 3
    finally:
        server.shutdown()
        server.server_close()


def test_combine_resolution_prefers_checkpoint_config(trained_project):
    """An SM-* procedure's suffix is a MODALITY, not a fusion: without an
    explicit --combine the service must pick up the fusion the checkpoint
    was trained with (config['combine']) instead of guessing 'av45' and
    crashing (or silently mis-fusing) at the first request."""
    svc = serve.ScoringService("ADNI", "SM-av45", combine=None,
                               n_splits=2, project_root=trained_project)
    assert svc.combine == "PoE"
    assert svc.health()["combine"] == "PoE"
    ids = list(svc._frames[0].index[:2])
    out = svc.score_ids(ids)
    assert len(out["deviation"]) == 2
    assert np.isfinite(np.asarray(out["deviation"])).all()


def test_resolve_combine_rules():
    from multi_modal_normative_modeling_tpu.infer.ensemble import (
        resolve_combine,
    )

    # explicit flag > checkpoint config > validated procedure suffix
    assert resolve_combine("MoE", {"combine": "gPoE"}, "SM-av45") == "MoE"
    assert resolve_combine(None, {"combine": "gPoE"}, "SM-av45") == "gPoE"
    assert resolve_combine(None, {}, "SE-MoE") == "MoE"
    with pytest.raises(ValueError, match="pass the fusion explicitly"):
        resolve_combine(None, {}, "SM-av45")
    with pytest.raises(ValueError, match="pass the fusion explicitly"):
        resolve_combine(None, None, "nodash")


def test_raw_payload_ragged_features_are_a_client_error(service):
    """Ragged / non-numeric feature matrices must surface as ServeError
    (HTTP 400), not a raw ValueError (HTTP 500)."""
    covs = {"AGE": [70, 71], "PTGENDER": [1, 0]}
    with pytest.raises(serve.ServeError, match="not a numeric"):
        service.score_raw({"av45": [[0.1] * 90, [0.2] * 89]}, covs)
    with pytest.raises(serve.ServeError, match="not a numeric"):
        service.score_raw({"av45": [["x"] * 90, ["y"] * 90]}, covs)


def test_http_auth_token_and_body_cap(service):
    """Bind-contract hardening: with a token set, POST /score requires
    Authorization: Bearer <token> (401 otherwise), /healthz stays open for
    liveness probes, and oversized / length-less bodies are refused
    (413/411) before being read."""
    import urllib.error

    server = serve.make_server(service, port=0, auth_token="s3cret",
                               max_body_bytes=512)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"

    def post(payload_bytes, headers=None):
        req = urllib.request.Request(
            base + "/score", data=payload_bytes,
            headers={"Content-Type": "application/json", **(headers or {})})
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read()), resp.headers
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read()), e.headers

    ids = list(service._frames[0].index[:2])
    body = json.dumps({"ids": ids}).encode()
    try:
        # healthz needs no token (liveness probes must stay cheap)
        with urllib.request.urlopen(base + "/healthz") as resp:
            assert json.loads(resp.read())["status"] == "ok"

        status, out, headers = post(body)                   # no token
        assert status == 401 and "token" in out["error"]
        assert headers.get("WWW-Authenticate") == "Bearer"
        status, out, _ = post(body, {"Authorization": "Bearer wrong"})
        assert status == 401
        status, out, _ = post(body, {"Authorization": "Bearer s3cret"})
        assert status == 200 and len(out["deviation"]) == 2

        # body cap: an oversized Content-Length is refused up front
        big = json.dumps({"ids": ids, "pad": "x" * 4096}).encode()
        status, out, _ = post(big, {"Authorization": "Bearer s3cret"})
        assert status == 413 and "exceeds cap" in out["error"]

        # auth outranks the cap: no token + oversized is still 401
        status, out, _ = post(big)
        assert status == 401

        # daemon still alive and correct after the refusals
        status, out, _ = post(body, {"Authorization": "Bearer s3cret"})
        assert status == 200
    finally:
        server.shutdown()
        server.server_close()


def test_http_missing_content_length_is_411(service):
    """Unparseable AND truly-absent Content-Length both get 411, not a
    crash (an absent header would otherwise default to 0 and a chunked
    body would be left unread, desyncing keep-alive connections)."""
    import http.client

    server = serve.make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]

    def post_with_headers(headers):
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.putrequest("POST", "/score", skip_accept_encoding=True)
        for k, v in headers:
            conn.putheader(k, v)
        conn.endheaders()
        resp = conn.getresponse()
        out = (resp.status, json.loads(resp.read()))
        conn.close()
        return out

    try:
        status, body = post_with_headers(
            [("Content-Type", "application/json"),
             ("Content-Length", "not-a-number")])
        assert status == 411 and "Content-Length" in body["error"]
        status, body = post_with_headers(
            [("Content-Type", "application/json")])  # header absent
        assert status == 411 and "Content-Length" in body["error"]
    finally:
        server.shutdown()
        server.server_close()


def test_http_non_ascii_auth_header_is_401_not_a_crash(service):
    """hmac.compare_digest raises TypeError on non-ASCII str operands;
    the handler must compare bytes and answer 401, not drop the
    connection with a traceback."""
    import urllib.error

    server = serve.make_server(service, port=0, auth_token="s3cret")
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/score", data=b"{}",
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer s\xe9cret"})
        try:
            with urllib.request.urlopen(req) as resp:
                status = resp.status
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 401
    finally:
        server.shutdown()
        server.server_close()


def test_make_server_refuses_empty_token_and_warns_on_open_bind(service,
                                                                caplog):
    import logging

    with pytest.raises(ValueError, match="non-empty"):
        serve.make_server(service, port=0, auth_token="")
    with caplog.at_level(logging.WARNING, logger="mmnm.serve"):
        server = serve.make_server(service, host="0.0.0.0", port=0)
        server.server_close()
    assert any("WITHOUT --auth_token" in r.getMessage()
               for r in caplog.records)
