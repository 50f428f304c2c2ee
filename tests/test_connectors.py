"""Connector wiring: JSON schema inference (kafka.rs parity), JSON stream
replay, CSV side-input + broadcast enrichment join (q13 path)."""

import json

from pyspark.sql import functions as F

from squirtle_spark import sources, streaming


def test_json_schema_inference_and_stream(spark, tmp_path):
    p = tmp_path / "json-in"
    p.mkdir()
    recs = [{"auction": i, "price": i * 10, "who": f"u{i % 3}"} for i in range(20)]
    (p / "part-0.json").write_text("\n".join(json.dumps(r) for r in recs[:10]))
    (p / "part-1.json").write_text("\n".join(json.dumps(r) for r in recs[10:]))

    schema = sources.infer_json_schema(spark, str(p))
    assert {f.name for f in schema.fields} == {"auction", "price", "who"}

    stream = sources.json_stream(spark, str(p))
    agg = (
        stream.groupBy("who").agg(F.count("*").alias("n"), F.sum("price").alias("tot"))
    )
    rows = streaming.run_available_now(
        agg, checkpoint=str(tmp_path / "ckpt-json"), mode="complete"
    )
    assert sum(r["n"] for r in rows) == 20


def test_csv_side_input_join(spark, tmp_path):
    """q13 with a real CSV side input file + broadcast join."""
    csv = tmp_path / "side.csv"
    lines = ["key,value"] + [f"{k},side_{k % 42}" for k in range(1000)]
    csv.write_text("\n".join(lines))

    side = sources.csv_side_input(spark, str(csv))
    assert side.count() == 1000

    from squirtle_spark import catalog

    catalog.register_all(spark, "/root/testdata/sf0.001")
    bid = spark.table("bid")
    joined = bid.join(
        F.broadcast(side), F.pmod(bid.auction, F.lit(1000)) == side.key
    ).select("auction", "bidder", "price", "value")
    assert joined.count() == bid.count()  # every auction id resolves
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan

def test_socket_json_stream_live_push(spark, tmp_path):
    """Drive the push-based broker stand-in end to end: a localhost TCP
    server pushes newline-delimited JSON bid events; the socket source
    connects, the shared bytes→JSON→columns decode parses them, and the
    drained rows must equal what the server sent."""
    import socket
    import threading
    import time as _time

    events = [
        {"auction": 1000 + i, "bidder": 50 + i, "price": 7 * i + 1}
        for i in range(25)
    ]
    payload = "".join(json.dumps(e) + "\n" for e in events).encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve() -> None:
        conn, _ = srv.accept()
        with conn:
            conn.sendall(payload)
            stop.wait(30)  # keep the connection open while Spark drains

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    schema = "auction BIGINT, bidder BIGINT, price BIGINT"
    stream = sources.socket_json_stream(spark, "127.0.0.1", port, schema)
    q = (
        stream.writeStream.format("memory")
        .queryName("socket_bids")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-socket"))
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if spark.sql("SELECT * FROM socket_bids").count() >= len(events):
                break
            _time.sleep(0.5)
        got = [
            (r["auction"], r["bidder"], r["price"])
            for r in spark.sql("SELECT * FROM socket_bids").collect()
        ]
    finally:
        q.stop()
        stop.set()
        srv.close()
    expected = [(e["auction"], e["bidder"], e["price"]) for e in events]
    assert sorted(got) == sorted(expected)
