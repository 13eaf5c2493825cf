// C ABI client library for april_asr_tpu (see april_tpu_api.h).
//
// Thin TCP client to an `april-serve` process: models resolve metadata via
// the info opcode, each session owns a socket + reader thread that parses
// the server's newline-delimited JSON results and fires the C handler with
// an AprilToken array (reference handler contract: tokens are valid only
// during the call — april_api.h:118-142, :176-179).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 april_capi.cc -o libapril_tpu.so -pthread

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "april_tpu_api.h"

namespace {

int g_client_version = 0;

// ---------------------------------------------------------------------------
// Minimal JSON parser — just enough for the serve protocol's flat messages.
// ---------------------------------------------------------------------------

struct JsonValue;
using JsonObject = std::vector<std::pair<std::string, JsonValue>>;

struct JsonValue {
  enum Kind { NUL, BOOL, NUM, STR, ARR, OBJ } kind = NUL;
  bool b = false;
  double num = 0.0;
  std::string str;
  std::vector<JsonValue> arr;
  JsonObject obj;

  const JsonValue *get(const std::string &key) const {
    for (const auto &kv : obj)
      if (kv.first == key) return &kv.second;
    return nullptr;
  }
};

struct JsonParser {
  const char *p;
  const char *end;
  bool ok = true;

  explicit JsonParser(const std::string &s) : p(s.data()), end(s.data() + s.size()) {}

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
  }
  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) {
      ++p;
      return true;
    }
    return false;
  }

  JsonValue parse() {
    JsonValue v;
    skip_ws();
    if (p >= end) {
      ok = false;
      return v;
    }
    char c = *p;
    if (c == '{') {
      ++p;
      v.kind = JsonValue::OBJ;
      skip_ws();
      if (consume('}')) return v;
      while (ok) {
        skip_ws();
        JsonValue key = parse_string();
        if (!ok || !consume(':')) {
          ok = false;
          return v;
        }
        v.obj.emplace_back(key.str, parse());
        if (consume(',')) continue;
        if (consume('}')) return v;
        ok = false;
      }
    } else if (c == '[') {
      ++p;
      v.kind = JsonValue::ARR;
      skip_ws();
      if (consume(']')) return v;
      while (ok) {
        v.arr.push_back(parse());
        if (consume(',')) continue;
        if (consume(']')) return v;
        ok = false;
      }
    } else if (c == '"') {
      return parse_string();
    } else if (c == 't' || c == 'f') {
      v.kind = JsonValue::BOOL;
      if (end - p >= 4 && strncmp(p, "true", 4) == 0) {
        v.b = true;
        p += 4;
      } else if (end - p >= 5 && strncmp(p, "false", 5) == 0) {
        v.b = false;
        p += 5;
      } else
        ok = false;
    } else if (c == 'n') {
      if (end - p >= 4 && strncmp(p, "null", 4) == 0)
        p += 4;
      else
        ok = false;
    } else {
      v.kind = JsonValue::NUM;
      char *after = nullptr;
      v.num = strtod(p, &after);
      if (after == p)
        ok = false;
      else
        p = after;
    }
    return v;
  }

  JsonValue parse_string() {
    JsonValue v;
    v.kind = JsonValue::STR;
    skip_ws();
    if (p >= end || *p != '"') {
      ok = false;
      return v;
    }
    ++p;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        ++p;
        switch (*p) {
          case 'n': v.str += '\n'; break;
          case 't': v.str += '\t'; break;
          case 'r': v.str += '\r'; break;
          case 'b': v.str += '\b'; break;
          case 'f': v.str += '\f'; break;
          case 'u': {
            if (end - p >= 5) {
              unsigned code = 0;
              sscanf(p + 1, "%4x", &code);
              p += 4;
              // UTF-8 encode (BMP only; serve output has no surrogates)
              if (code < 0x80) {
                v.str += static_cast<char>(code);
              } else if (code < 0x800) {
                v.str += static_cast<char>(0xC0 | (code >> 6));
                v.str += static_cast<char>(0x80 | (code & 0x3F));
              } else {
                v.str += static_cast<char>(0xE0 | (code >> 12));
                v.str += static_cast<char>(0x80 | ((code >> 6) & 0x3F));
                v.str += static_cast<char>(0x80 | (code & 0x3F));
              }
            }
            break;
          }
          default: v.str += *p;
        }
      } else {
        v.str += *p;
      }
      ++p;
    }
    if (p < end) ++p;  // closing quote
    return v;
  }
};

// ---------------------------------------------------------------------------
// Socket helpers
// ---------------------------------------------------------------------------

int dial(const std::string &endpoint) {
  std::string hostport = endpoint;
  const std::string prefix = "tcp://";
  if (hostport.rfind(prefix, 0) == 0) hostport = hostport.substr(prefix.size());
  size_t colon = hostport.rfind(':');
  if (colon == std::string::npos) return -1;
  std::string host = hostport.substr(0, colon);
  std::string port = hostport.substr(colon + 1);

  addrinfo hints{};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  addrinfo *res = nullptr;
  if (getaddrinfo(host.c_str(), port.c_str(), &hints, &res) != 0) return -1;
  int fd = -1;
  for (addrinfo *ai = res; ai; ai = ai->ai_next) {
    fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  return fd;
}

bool send_all(int fd, const void *data, size_t n) {
  const char *p = static_cast<const char *>(data);
  while (n) {
    ssize_t k = send(fd, p, n, 0);
    if (k <= 0) return false;
    p += k;
    n -= static_cast<size_t>(k);
  }
  return true;
}

bool send_frame(int fd, uint8_t opcode, const void *payload, uint32_t len) {
  char header[5];
  header[0] = static_cast<char>(opcode);
  memcpy(header + 1, &len, 4);  // little-endian hosts only (x86/arm64)
  if (!send_all(fd, header, 5)) return false;
  return len == 0 || send_all(fd, payload, len);
}

// Read one newline-terminated line (blocking). Returns false on EOF/error.
bool recv_line(int fd, std::string &buf, std::string &line) {
  while (true) {
    size_t nl = buf.find('\n');
    if (nl != std::string::npos) {
      line = buf.substr(0, nl);
      buf.erase(0, nl + 1);
      return true;
    }
    char tmp[4096];
    ssize_t k = recv(fd, tmp, sizeof(tmp), 0);
    if (k <= 0) return false;
    buf.append(tmp, static_cast<size_t>(k));
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// Model
// ---------------------------------------------------------------------------

struct AprilASRModel_i {
  std::string endpoint;
  std::string name, description, language;
  size_t sample_rate = 16000;
};

extern "C" void aam_api_init(int version) { g_client_version = version; }

extern "C" AprilASRModel aam_create_model(const char *endpoint) {
  if (!endpoint) return nullptr;
  int fd = dial(endpoint);
  if (fd < 0) return nullptr;
  AprilASRModel m = new (std::nothrow) AprilASRModel_i();
  if (!m) {
    close(fd);
    return nullptr;
  }
  m->endpoint = endpoint;
  bool got = false;
  if (send_frame(fd, 3, nullptr, 0)) {
    std::string buf, line;
    if (recv_line(fd, buf, line)) {
      JsonParser jp(line);
      JsonValue v = jp.parse();
      const JsonValue *info = jp.ok ? v.get("info") : nullptr;
      if (info) {
        if (const JsonValue *x = info->get("name")) m->name = x->str;
        if (const JsonValue *x = info->get("description")) m->description = x->str;
        if (const JsonValue *x = info->get("language")) m->language = x->str;
        if (const JsonValue *x = info->get("sample_rate"))
          m->sample_rate = static_cast<size_t>(x->num);
        got = true;
      }
    }
  }
  close(fd);
  if (!got) {
    delete m;
    return nullptr;
  }
  return m;
}

extern "C" const char *aam_get_name(AprilASRModel m) { return m->name.c_str(); }
extern "C" const char *aam_get_description(AprilASRModel m) {
  return m->description.c_str();
}
extern "C" const char *aam_get_language(AprilASRModel m) {
  return m->language.c_str();
}
extern "C" size_t aam_get_sample_rate(AprilASRModel m) { return m->sample_rate; }
extern "C" void aam_free(AprilASRModel m) { delete m; }

// ---------------------------------------------------------------------------
// Session
// ---------------------------------------------------------------------------

struct AprilASRSession_i {
  int fd = -1;
  AprilConfig config{};
  std::thread reader;
  std::atomic<bool> closing{false};
  std::mutex send_mu;
  // realtime-speedup telemetry (reference april_api.h:188-192): refreshed
  // by {"speedup": x} replies to the opcode-5 request; generation-counted
  // so the getter can wait for a fresh sample without risking a hang.
  std::mutex sp_mu;
  std::condition_variable sp_cv;
  float speedup = 1.0f;
  uint64_t sp_gen = 0;

  void reader_loop() {
    std::string buf, line;
    while (recv_line(fd, buf, line)) {
      JsonParser jp(line);
      JsonValue v = jp.parse();
      if (!jp.ok || v.kind != JsonValue::OBJ) continue;
      if (const JsonValue *sp = v.get("speedup")) {
        std::lock_guard<std::mutex> lk(sp_mu);
        speedup = static_cast<float>(sp->num);
        ++sp_gen;
        sp_cv.notify_all();
        continue;
      }
      const JsonValue *res = v.get("result");
      if (!res) continue;
      AprilResultType rt = APRIL_RESULT_UNKNOWN;
      if (res->str == "partial") rt = APRIL_RESULT_RECOGNITION_PARTIAL;
      else if (res->str == "final") rt = APRIL_RESULT_RECOGNITION_FINAL;
      else if (res->str == "silence") rt = APRIL_RESULT_SILENCE;
      else if (res->str == "cant_keep_up") rt = APRIL_RESULT_ERROR_CANT_KEEP_UP;

      std::vector<std::string> texts;
      std::vector<AprilToken> toks;
      if (const JsonValue *arr = v.get("tokens")) {
        texts.reserve(arr->arr.size());
        toks.reserve(arr->arr.size());
        for (const JsonValue &t : arr->arr) {
          AprilToken tok{};
          const JsonValue *x;
          texts.push_back((x = t.get("t")) ? x->str : "");
          tok.logprob = (x = t.get("lp")) ? static_cast<float>(x->num) : 0.0f;
          tok.flags = 0;
          if ((x = t.get("wb")) && x->b) tok.flags |= APRIL_TOKEN_FLAG_WORD_BOUNDARY_BIT;
          if ((x = t.get("se")) && x->b) tok.flags |= APRIL_TOKEN_FLAG_SENTENCE_END_BIT;
          tok.time_ms = (x = t.get("time"))
                            ? static_cast<size_t>(x->num * 1000.0 + 0.5)
                            : 0;
          toks.push_back(tok);
        }
        for (size_t i = 0; i < toks.size(); ++i) toks[i].token = texts[i].c_str();
      }
      if (config.handler && !closing.load())
        config.handler(config.userdata, rt, toks.size(),
                       toks.empty() ? nullptr : toks.data());
    }
  }
};

extern "C" AprilASRSession aas_create_session(AprilASRModel model,
                                              AprilConfig config) {
  if (!model || !config.handler) return nullptr;
  int fd = dial(model->endpoint);
  if (fd < 0) return nullptr;
  AprilASRSession s = new (std::nothrow) AprilASRSession_i();
  if (!s) {
    close(fd);
    return nullptr;
  }
  s->fd = fd;
  s->config = config;
  // Speaker id: forward a non-zero AprilConfig.speaker to the server
  // (opcode 6) so its saved session state is restored into this slot and
  // snapshotted back on disconnect. The reference reserved this field but
  // never implemented it (reference april_api.h:78-84); here it has effect
  // from every binding.
  bool has_speaker = false;
  for (unsigned char b : config.speaker.data) has_speaker |= (b != 0);
  if (has_speaker) {
    char hex[33];
    for (int i = 0; i < 16; ++i)
      std::snprintf(hex + 2 * i, 3, "%02x", config.speaker.data[i]);
    std::lock_guard<std::mutex> lk(s->send_mu);
    send_frame(fd, 6, hex, 32);
  }
  s->reader = std::thread([s] { s->reader_loop(); });
  return s;
}

extern "C" void aas_feed_pcm16(AprilASRSession s, short *pcm16, size_t count) {
  if (!s) return;
  std::lock_guard<std::mutex> lk(s->send_mu);
  send_frame(s->fd, 1, pcm16, static_cast<uint32_t>(count * sizeof(short)));
}

extern "C" void aas_flush(AprilASRSession s) {
  if (!s) return;
  std::lock_guard<std::mutex> lk(s->send_mu);
  send_frame(s->fd, 2, nullptr, 0);
}

extern "C" float aas_realtime_get_speedup(AprilASRSession s) {
  if (!s) return 1.0f;
  uint64_t gen;
  {
    std::lock_guard<std::mutex> lk(s->sp_mu);
    gen = s->sp_gen;
  }
  {
    std::lock_guard<std::mutex> lk(s->send_mu);
    if (!send_frame(s->fd, 5, nullptr, 0)) {
      // fallback read under sp_mu, not send_mu: the reader thread writes
      // speedup under sp_mu, so this read must take the same lock
      std::lock_guard<std::mutex> splk(s->sp_mu);
      return s->speedup;
    }
  }
  std::unique_lock<std::mutex> lk(s->sp_mu);
  // wait briefly for the fresh sample; fall back to the last known value
  // (first call before any reply returns the 1.0 initial state)
  s->sp_cv.wait_for(lk, std::chrono::milliseconds(250),
                    [&] { return s->sp_gen != gen; });
  return s->speedup;
}

extern "C" void aas_free(AprilASRSession s) {
  if (!s) return;
  s->closing.store(true);
  shutdown(s->fd, SHUT_RDWR);
  if (s->reader.joinable()) s->reader.join();
  close(s->fd);
  delete s;
}
