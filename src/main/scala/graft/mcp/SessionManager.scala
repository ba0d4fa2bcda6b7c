package graft.mcp

import scala.collection.mutable

/** Session-scoped result cache + paging for the MCP query surface — the
  * reference's agent-facing session model
  * (components/clp-mcp-server/clp_mcp_server/server/session_manager.py:13-237)
  * re-expressed: a query's formatted log entries are cached once per session
  * and paged out on demand, sessions gate on `get_instructions` having been
  * read, and idle sessions expire after a TTL.
  *
  * Everything here is driver-side metadata — the cache is capped at
  * [[SessionManager.MaxCachedResults]] entries (the Spark side enforces the
  * cap BEFORE collecting, with a sort-limit that never materializes the full
  * result on the driver), so session state stays kilobytes regardless of
  * corpus size.
  *
  * Error contract (mirrors session_manager.py): every fallible call answers
  * `Either[String, PageData]` — `Left` carries exactly the reference's error
  * strings, rendered as `{"Error": …}` at the protocol layer.
  */
object SessionManager {
  val NumItemsPerPage = 10
  val MaxCachedResults = 1000
  val SessionTtlMs: Long = 600 * 1000L

  val GetInstructionsNotRunError =
    "Please call `get_instructions()` first to understand how to use this MCP server."
  val NoCachedResultError = "No previous paginated response in this session."
  val PageOutOfBoundsError = "Page index is out of bounds."

  /** The system prompt handed to the querying agent before anything else —
    * same role as server/constants.py SYSTEM_PROMPT (guidance for writing
    * narrow KQL), re-worded for this engine's KQL surface. */
  val Instructions: String =
    """You are querying a CLP-style log archive with KQL (Kibana Query Language).
      |Generate KQL that expresses the user's intent as narrowly as possible:
      |- Prefer specific field:value terms over free-text or wildcard searches.
      |- Combine terms with AND / OR / NOT; group with parentheses.
      |- Avoid bare `*` wildcards - they force wide scans and large result sets.
      |- If the user gives a time range, pass it so archives outside the range
      |  are pruned before any data is read.
      |Results are returned newest-first and paged; call `get_nth_page` to walk
      |pages of a previous `search_by_kql` result.""".stripMargin

  /** One page plus its paging metadata — the success dict of
    * session_manager.py get_page_data (keys kept 1:1). */
  final case class PageData(items: Seq[String], numTotalPages: Int,
                            numTotalItems: Int, numItemsPerPage: Int,
                            hasNext: Boolean, hasPrevious: Boolean)
}

/** Paginates one query's cached entries (session_manager.py:13-54). */
final class PaginatedQueryResult(entries: IndexedSeq[String], itemsPerPage: Int) {
  import SessionManager._
  require(entries.length <= MaxCachedResults,
    s"PaginatedQueryResult exceeds maximum allowed cached results: " +
      s"${entries.length} > $MaxCachedResults.")
  require(itemsPerPage > 0,
    s"Invalid num_items_per_page: $itemsPerPage, it must be a positive integer.")

  private val numPages: Int = (entries.length + itemsPerPage - 1) / itemsPerPage

  /** Zero-based page, or None when out of bounds. NOTE an empty result has
    * zero pages, so even page 0 is out of bounds — same as the reference,
    * whose Page construction is guarded by `num_pages < page_number`. */
  def getPage(pageIndex: Int): Option[SessionManager.PageData] =
    if (pageIndex < 0 || pageIndex >= numPages) None
    else {
      val from = pageIndex * itemsPerPage
      Some(SessionManager.PageData(
        items = entries.slice(from, from + itemsPerPage),
        numTotalPages = numPages,
        numTotalItems = entries.length,
        numItemsPerPage = itemsPerPage,
        hasNext = pageIndex + 1 < numPages,
        hasPrevious = pageIndex > 0))
    }
}

/** Per-session state: the instructions gate, the cached paginated result,
  * and the idle-expiry stamp (session_manager.py:57-154). */
final class SessionState(itemsPerPage: Int, ttlMs: Long, clock: () => Long) {
  import SessionManager._

  private var cached: Option[PaginatedQueryResult] = None
  private var lastAccessed: Long = clock()
  private var instructionsRetrieved = false

  def getInstructions(): String = {
    instructionsRetrieved = true
    Instructions
  }

  def getPageData(pageIndex: Int): Either[String, PageData] =
    if (!instructionsRetrieved) Left(GetInstructionsNotRunError)
    else cached match {
      case None => Left(NoCachedResultError)
      case Some(r) => r.getPage(pageIndex).toRight(PageOutOfBoundsError)
    }

  /** First page right after caching: an EMPTY result answers an empty
    * PageData (0 pages / 0 items) instead of out-of-bounds, so
    * `search_by_kql` can always return paging metadata on success. */
  def firstPageOrEmpty(results: IndexedSeq[String]): Either[String, PageData] =
    if (!instructionsRetrieved) Left(GetInstructionsNotRunError)
    else {
      cached = Some(new PaginatedQueryResult(results, itemsPerPage))
      if (results.isEmpty)
        Right(PageData(Nil, 0, 0, itemsPerPage, hasNext = false, hasPrevious = false))
      else getPageData(0)
    }

  /** Drop the cached paginated result (a failed or overflowed search must
    * not leave the PREVIOUS query's pages answerable — `get_nth_page` after
    * such a search answers NoCachedResultError, not stale pages). */
  def clearCachedResult(): Unit = cached = None

  def isExpired: Boolean = clock() - lastAccessed > ttlMs
  def updateAccessTime(): Unit = lastAccessed = clock()
}

/** Keyed session registry with TTL sweep (session_manager.py:157-237).
  * Single-threaded by contract, like the reference's event-loop model — the
  * stdio server serves one connection; a multi-connection host would wrap
  * calls in its own serialization. */
final class SessionManager(ttlMs: Long = SessionManager.SessionTtlMs,
                           itemsPerPage: Int = SessionManager.NumItemsPerPage,
                           clock: () => Long = () => System.currentTimeMillis()) {
  import SessionManager._

  private val sessions = mutable.Map.empty[String, SessionState]

  def getOrCreateSession(sessionId: String): SessionState = {
    sessions.get(sessionId).filter(_.isExpired)
      .foreach(_ => sessions.remove(sessionId))
    val s = sessions.getOrElseUpdate(sessionId,
      new SessionState(itemsPerPage, ttlMs, clock))
    s.updateAccessTime()
    s
  }

  def cleanupExpiredSessions(): Unit =
    sessions.filterInPlace((_, s) => !s.isExpired)

  def activeSessionCount: Int = sessions.size

  def getInstructions(sessionId: String): String =
    getOrCreateSession(sessionId).getInstructions()

  def cacheQueryResultAndGetFirstPage(sessionId: String,
                                      results: IndexedSeq[String])
      : Either[String, PageData] =
    getOrCreateSession(sessionId).firstPageOrEmpty(results)

  def getNthPage(sessionId: String, pageIndex: Int): Either[String, PageData] =
    getOrCreateSession(sessionId).getPageData(pageIndex)

  /** See [[SessionState.clearCachedResult]]. */
  def clearCachedResult(sessionId: String): Unit =
    getOrCreateSession(sessionId).clearCachedResult()
}
