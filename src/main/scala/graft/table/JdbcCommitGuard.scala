package graft.table

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Catalog-service commit CAS over plain JDBC — the non-filesystem
 * [[CommitGuard]] backend for object stores without atomic rename or
 * link (S3 and friends), mirroring the reference's JDBC-catalog mode
 * (reference IcebergSupport.scala:32-35, where the Iceberg runtime
 * delegates the whole commit pointer swap to a JDBC catalog).
 *
 * Protocol: the version slot is a PRIMARY KEY row in `graft_commit_slots`
 * — `INSERT` is the compare-and-swap (exactly one committer's insert
 * commits; every racer hits the duplicate-key violation, SQLState 23505,
 * and loses). The metadata payload itself is stored IN the claimed row,
 * which makes installation idempotent and crash-safe: the storage write
 * of `v<N>.metadata.json` happens only AFTER the claim (uncontended — the
 * slot owner is unique), and if the winner dies between claim and
 * install, any later loser that finds the slot taken but the file absent
 * re-materializes the file from the service copy before retrying. The
 * database is the source of truth for who won; storage is a cache of it.
 *
 * Scale/production notes:
 *  - Point `url` at any JDBC-reachable store (PostgreSQL, MySQL, a Derby
 *    network server, ...). Commits are per-table rare events — one short
 *    transaction each — so a plain `DriverManager` connection per publish
 *    is fine; pool at the DataSource level if your commit rate says
 *    otherwise.
 *  - This sandbox ships only EMBEDDED Derby (derby.jar without the
 *    derbynet server), which admits a single JVM per database directory;
 *    the cross-PROCESS race is therefore exercised at the protocol level
 *    by CrossProcessCommitSpec (filesystem CAS, real competing JVMs) and
 *    the SQL-CAS adjudication under true concurrency by
 *    JdbcCommitGuardSpec's thread races. Against a server-mode database
 *    the identical code is multi-process.
 */
final class JdbcCommitGuard(url: String) extends CommitGuard {

  import JdbcCommitGuard._

  def publish(fs: FileSystem, tmp: Path, target: Path, payload: Array[Byte]): Unit = {
    val slot = fs.makeQualified(target).toUri.toString
    withConnection(url) { c =>
      ensureTable(c)
      val claimed =
        try {
          val ps = c.prepareStatement(
            s"INSERT INTO $TableName(slot, payload) VALUES(?, ?)")
          try {
            ps.setString(1, slot)
            ps.setBytes(2, payload)
            ps.executeUpdate()
          } finally ps.close()
          true
        } catch {
          case e: SQLException if isDuplicateKey(e) => false
          case e: SQLException =>
            // NOT a duplicate key: the connection may have died after the
            // autocommitted INSERT became durable but before the ack — the
            // commit state is ambiguous. Re-query on a FRESH connection
            // and adjudicate instead of reporting a clean failure.
            adjudicateAmbiguousClaim(fs, tmp, target, payload, e,
              () => querySlot(url, slot))
            return
        }
      if (claimed) {
        CommitGuard.maybeCrashAfterClaim()
        // we own the slot: move the fully-written tmp into place (atomic —
        // a racing reader never observes a half-written metadata file)
        installOwned(fs, tmp, target)
      } else {
        fs.delete(tmp, false)
        // heal: if the winning committer died between claim and install,
        // re-materialize its metadata file from the service copy so
        // readers (and our own retry) see a complete log
        if (!fs.exists(target)) {
          val ps = c.prepareStatement(
            s"SELECT payload FROM $TableName WHERE slot = ?")
          try {
            ps.setString(1, slot)
            val rs = ps.executeQuery()
            if (rs.next()) {
              installBytes(fs, target, rs.getBytes(1))
            }
            rs.close()
          } finally ps.close()
        }
        lost(target)
      }
    }
  }
}

object JdbcCommitGuard {
  private val TableName = "graft_commit_slots"

  /** Route EVERY table commit in this JVM through the JDBC CAS at `url`.
    * Returns the previous guard selector so callers (tests, shutdown
    * hooks) can restore it. */
  def installGlobally(url: String): (FileSystem, Path) => CommitGuard = {
    val previous = SnapshotLog.commitGuardFor
    val guard = new JdbcCommitGuard(url)
    SnapshotLog.commitGuardFor = (_, _) => guard
    previous
  }

  private def withConnection[A](url: String)(f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** State re-query for the ambiguous-claim path: the slot's recorded
    * payload on a FRESH connection (the claim connection is suspect). */
  private def querySlot(url: String, slot: String): Option[Array[Byte]] =
    withConnection(url) { c =>
      val ps = c.prepareStatement(
        s"SELECT payload FROM $TableName WHERE slot = ?")
      try {
        ps.setString(1, slot)
        val rs = ps.executeQuery()
        try if (rs.next()) Some(rs.getBytes(1)) else None
        finally rs.close()
      } finally ps.close()
    }

  /** Derby has no CREATE TABLE IF NOT EXISTS; the already-exists SQLState
    * (X0Y32, or 42S01 on other engines) is the success path here. */
  private def ensureTable(c: Connection): Unit = {
    val st = c.createStatement()
    try st.executeUpdate(
      s"CREATE TABLE $TableName(slot VARCHAR(1024) NOT NULL PRIMARY KEY, payload BLOB NOT NULL)")
    catch {
      case e: SQLException
          if e.getSQLState == "X0Y32" || e.getSQLState == "42S01" => ()
    } finally st.close()
  }

  /** Duplicate-key adjudication: standard SQLState 23505 (also walk the
    * chained exceptions — Derby nests the constraint violation). */
  private def isDuplicateKey(e: SQLException): Boolean = {
    var cur: SQLException = e
    while (cur != null) {
      if (cur.getSQLState == "23505" ||
          cur.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException])
        return true
      cur = cur.getNextException
    }
    e.getCause match {
      case c: SQLException => isDuplicateKey(c)
      case _ => false
    }
  }
}
