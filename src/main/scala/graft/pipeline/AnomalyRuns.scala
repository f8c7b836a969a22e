package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One sensor reading (typed view of the bronze/silver event columns). */
case class SensorReading(bridge_id: Int, sensor_type: String,
                         event_time_ts: java.sql.Timestamp, value: Double)

/** An emitted anomaly-run alert: `run_len` consecutive anomalous readings
  * ending at `end_ts` (emitted once, when the run first reaches the
  * threshold — continued runs do not re-alert until a normal reading
  * resets them). */
case class AnomalyAlert(bridge_id: Int, sensor_type: String, run_len: Int,
                        start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

/** Custom streaming state with `flatMapGroupsWithState`: per-sensor
  * consecutive-anomaly run tracking — the one semantic in this pipeline
  * the built-in operators genuinely cannot express (windowed aggregates
  * see values, not *ordered run structure*; `dropDuplicates` sees keys,
  * not streaks). A structural-health monitor wants "alert when a sensor
  * reads out-of-range N times in a row", with the streak surviving
  * micro-batch boundaries — exactly `KeyValueGroupedDataset
  * .flatMapGroupsWithState` (SURVEY.md §1.3 / builder-brief streaming
  * ladder).
  *
  * Scale posture: state is ONE small struct per (bridge_id, sensor_type)
  * — cardinality is the physical sensor fleet, not the data volume, so
  * NoTimeout is deliberate and safe (the state cannot grow with 100 TB of
  * readings; a fleet of millions of sensors is megabytes of state).
  * Within a micro-batch the group iterator has no ordering guarantee, so
  * readings are sorted by event time before folding — per-group batch
  * sizes are bounded by (rate × trigger interval), driver-independent.
  *
  * Late data: readings older than the already-processed frontier are
  * folded in arrival order (the fold is per-batch sorted, cross-batch
  * append-ordered). True event-time reprocessing would need a watermark +
  * buffer in state; documented trade-off, matching the alerting use case
  * (an alert is about the observed streak, not a replayable aggregate).
  */
object AnomalyRuns {

  /** @param runLen   current consecutive-anomaly count (0 = healthy)
    * @param startUs  event-time micros of the run's first anomaly
    * @param lastUs   event-time micros of the run's latest anomaly */
  case class RunState(runLen: Int, startUs: Long, lastUs: Long)

  def alerts(readings: Dataset[SensorReading],
             isAnomalous: SensorReading => Boolean,
             minRun: Int): Dataset[AnomalyAlert] = {
    require(minRun >= 1, s"minRun must be >= 1 (got $minRun)")
    implicit val stateEnc = Encoders.product[RunState]
    implicit val alertEnc = Encoders.product[AnomalyAlert]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    readings
      .groupByKey(r => (r.bridge_id, r.sensor_type))
      .flatMapGroupsWithState[RunState, AnomalyAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bridge, sensor), rows, state) =>
          // full microsecond precision: getTime is millis only — the
          // sub-millisecond part lives in getNanos (events here are
          // micros via the TIMESTAMP(NANOS) handling)
          def micros(t: java.sql.Timestamp): Long =
            t.getTime / 1000L * 1000000L + t.getNanos / 1000L
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyAlert]
          var st = state.getOption.getOrElse(RunState(0, 0L, 0L))
          rows.toSeq.sortBy(r => micros(r.event_time_ts)).foreach { r =>
            if (isAnomalous(r)) {
              val ts = micros(r.event_time_ts)
              st = RunState(st.runLen + 1, if (st.runLen == 0) ts else st.startUs, ts)
              if (st.runLen == minRun) {
                def toTs(us: Long): java.sql.Timestamp = {
                  val t = new java.sql.Timestamp(us / 1000000L * 1000L)
                  t.setNanos((us % 1000000L).toInt * 1000)
                  t
                }
                out += AnomalyAlert(bridge, sensor, st.runLen,
                  toTs(st.startUs), toTs(st.lastUs))
              }
            } else {
              st = RunState(0, 0L, 0L)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
