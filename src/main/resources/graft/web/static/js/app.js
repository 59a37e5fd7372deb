// graft console — talks to the same REST surface the reference UI
// drives: POST /api/query (SQL or NL, with the destructive-statement
// confirm handshake), GET /api/tables, POST /api/upload,
// POST /api/conversations for follow-up context.
(function () {
  "use strict";

  var messages = document.getElementById("messages");
  var tableList = document.getElementById("table-list");
  var conversationId = null;

  function el(tag, cls, text) {
    var e = document.createElement(tag);
    if (cls) e.className = cls;
    if (text !== undefined) e.textContent = text;
    return e;
  }

  function addMessage(who, node, extraClass) {
    var m = el("div", "msg" + (extraClass ? " " + extraClass : ""));
    m.appendChild(el("div", "who", who));
    m.appendChild(node);
    messages.appendChild(m);
    messages.scrollTop = messages.scrollHeight;
  }

  function renderRows(data) {
    var wrap = el("div");
    if (data.generatedSQL) {
      wrap.appendChild(el("div", "gen-sql", "SQL: " + data.generatedSQL));
    }
    if (data.message !== undefined) {
      wrap.appendChild(el("pre", null, data.message));
      return wrap;
    }
    var cols = data.columns || [];
    var rows = data.rows || [];
    var table = el("table");
    var head = el("tr");
    cols.forEach(function (c) { head.appendChild(el("th", null, c)); });
    table.appendChild(head);
    rows.forEach(function (r) {
      var tr = el("tr");
      cols.forEach(function (c) {
        var v = r[c];
        tr.appendChild(el("td", null, v === null || v === undefined ? "NULL" : String(v)));
      });
      table.appendChild(tr);
    });
    wrap.appendChild(table);
    wrap.appendChild(el("div", "trunc",
      rows.length + " row(s)" + (data.truncated ? " (truncated to 1000)" : "")));
    return wrap;
  }

  function post(url, body) {
    return fetch(url, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(body)
    }).then(function (r) { return r.json(); });
  }

  function runQuery(query, isNatural, confirm) {
    var payload = { query: query, isNatural: isNatural };
    if (conversationId) payload.conversationId = conversationId;
    if (confirm) payload.confirm = true;
    post("/api/query", payload).then(function (data) {
      if (!data.success) {
        addMessage("graft", el("pre", null, data.error || "query failed"), "error");
        return;
      }
      if (data.requiresConfirmation) {
        var ok = window.confirm(
          "This statement modifies data:\n\n" + data.generatedSQL + "\n\nRun it?");
        if (ok) runQuery(query, isNatural, true);
        else addMessage("graft", el("pre", null, "cancelled"));
        return;
      }
      addMessage("graft", renderRows(data));
      refreshTables();
    }).catch(function (e) {
      addMessage("graft", el("pre", null, String(e)), "error");
    });
  }

  function refreshTables() {
    fetch("/api/tables").then(function (r) { return r.json(); }).then(function (data) {
      tableList.innerHTML = "";
      (data.tables || []).forEach(function (t) {
        var li = el("li", null, t);
        li.onclick = function () {
          document.getElementById("query-input").value = "SELECT * FROM " + t + " LIMIT 20";
        };
        tableList.appendChild(li);
      });
    });
  }

  document.getElementById("query-form").addEventListener("submit", function (ev) {
    ev.preventDefault();
    var input = document.getElementById("query-input");
    var q = input.value.trim();
    if (!q) return;
    addMessage("you", el("pre", null, q));
    runQuery(q, document.getElementById("is-natural").checked, false);
    input.value = "";
  });

  document.getElementById("upload-form").addEventListener("submit", function (ev) {
    ev.preventDefault();
    var table = document.getElementById("upload-table").value.trim();
    var format = document.getElementById("upload-format").value;
    var file = document.getElementById("upload-file").files[0];
    var status = document.getElementById("upload-status");
    if (!table || !file) return;
    status.textContent = "uploading…";
    fetch("/api/upload?table=" + encodeURIComponent(table) + "&format=" + format, {
      method: "POST", body: file
    }).then(function (r) { return r.json(); }).then(function (data) {
      status.textContent = data.success
        ? "imported " + data.rowsImported + " rows"
        : "failed: " + data.error;
      refreshTables();
    }).catch(function (e) { status.textContent = "failed: " + e; });
  });

  document.getElementById("imagedir-form").addEventListener("submit", function (ev) {
    ev.preventDefault();
    var dir = document.getElementById("imagedir-input").value.trim();
    var status = document.getElementById("imagedir-status");
    if (!dir) return;
    post("/api/image-dir", { directory: dir }).then(function (data) {
      status.textContent = data.success ? "image directory set" : "failed: " + data.error;
    }).catch(function (e) { status.textContent = "failed: " + e; });
  });

  fetch("/api/image-dir").then(function (r) { return r.json(); }).then(function (data) {
    if (data.success && data.directory)
      document.getElementById("imagedir-input").value = data.directory;
  });

  post("/api/conversations", {}).then(function (data) {
    if (data.success) conversationId = data.conversationId;
  });
  refreshTables();
})();
