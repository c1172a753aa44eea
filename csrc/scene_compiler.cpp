// Native scene compiler: scenario JSON -> padded world arrays.
//
// C++ replacement for the hot path of the host-side scene pipeline — the
// analogue of the reference's MapReader + json_serialization + level_gen
// (reference: src/MapReader.cpp, src/json_serialization.hpp,
// src/level_gen.cpp), emitting the struct-of-arrays blocks consumed by
// gpudrive_lab_tpu.scene.compiler.  Exposed through a plain C ABI and loaded
// via ctypes (no pybind11 in this environment); the Python implementation
// remains as the reference/fallback path and parity is pinned by
// tests/test_native_compiler.py.
//
// Contains a small self-written recursive-descent JSON parser (no external
// JSON dependency).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal JSON parser
// ---------------------------------------------------------------------------

struct JValue;
using JObject = std::map<std::string, JValue>;
using JArray = std::vector<JValue>;

struct JValue {
  enum Kind { Null, Bool, Num, Str, Arr, Obj } kind = Null;
  bool b = false;
  double num = 0.0;
  std::string str;
  std::shared_ptr<JArray> arr;
  std::shared_ptr<JObject> obj;

  const JValue* get(const std::string& key) const {
    if (kind != Obj || !obj) return nullptr;
    auto it = obj->find(key);
    return it == obj->end() ? nullptr : &it->second;
  }
  double as_num(double dflt = 0.0) const {
    if (kind == Num) return num;
    if (kind == Bool) return b ? 1.0 : 0.0;
    return dflt;
  }
};

struct Parser {
  const char* p;
  const char* end;
  bool ok = true;

  explicit Parser(const char* data, size_t n) : p(data), end(data + n) {}

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }

  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) {
      ++p;
      return true;
    }
    return false;
  }

  JValue parse_value() {
    skip_ws();
    if (p >= end) {
      ok = false;
      return {};
    }
    switch (*p) {
      case '{':
        return parse_object();
      case '[':
        return parse_array();
      case '"':
        return parse_string();
      case 't':
      case 'f':
        return parse_bool();
      case 'n':
        p += 4;
        return {};
      default:
        return parse_number();
    }
  }

  JValue parse_object() {
    JValue v;
    v.kind = JValue::Obj;
    v.obj = std::make_shared<JObject>();
    ++p;  // '{'
    skip_ws();
    if (consume('}')) return v;
    while (ok) {
      skip_ws();
      JValue key = parse_string();
      if (!consume(':')) {
        ok = false;
        break;
      }
      (*v.obj)[key.str] = parse_value();
      if (consume(',')) continue;
      if (consume('}')) break;
      ok = false;
      break;
    }
    return v;
  }

  JValue parse_array() {
    JValue v;
    v.kind = JValue::Arr;
    v.arr = std::make_shared<JArray>();
    ++p;  // '['
    skip_ws();
    if (consume(']')) return v;
    while (ok) {
      v.arr->push_back(parse_value());
      if (consume(',')) continue;
      if (consume(']')) break;
      ok = false;
      break;
    }
    return v;
  }

  JValue parse_string() {
    JValue v;
    v.kind = JValue::Str;
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
            // decode \uXXXX (BMP only; sufficient for scene names)
            if (p + 4 < end) {
              unsigned code = 0;
              for (int i = 1; i <= 4; ++i) {
                code <<= 4;
                char c = p[i];
                code |= (c >= '0' && c <= '9')   ? c - '0'
                        : (c >= 'a' && c <= 'f') ? c - 'a' + 10
                        : (c >= 'A' && c <= 'F') ? c - 'A' + 10
                                                 : 0;
              }
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
              p += 4;
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

  JValue parse_bool() {
    JValue v;
    v.kind = JValue::Bool;
    if (*p == 't') {
      v.b = true;
      p += 4;
    } else {
      v.b = false;
      p += 5;
    }
    return v;
  }

  JValue parse_number() {
    JValue v;
    v.kind = JValue::Num;
    char* out = nullptr;
    v.num = std::strtod(p, &out);
    if (out == p) ok = false;
    p = out;
    return v;
  }
};

// ---------------------------------------------------------------------------
// Scene compilation (mirrors gpudrive_lab_tpu/scene/{loader,compiler}.py)
// ---------------------------------------------------------------------------

constexpr int kMaxAgents = 128;
constexpr int kTrajLen = 91;
constexpr int kMaxPositions = 91;
constexpr int kMaxGeometry = 1746;
constexpr float kStaticThreshold = 0.2f;

enum EntityType : int32_t {
  ET_NONE = 0,
  ET_ROAD_EDGE = 1,
  ET_ROAD_LINE = 2,
  ET_ROAD_LANE = 3,
  ET_CROSSWALK = 4,
  ET_SPEED_BUMP = 5,
  ET_STOP_SIGN = 6,
  ET_VEHICLE = 7,
  ET_PEDESTRIAN = 8,
  ET_CYCLIST = 9,
};

int32_t object_type_of(const std::string& s) {
  if (s == "vehicle") return ET_VEHICLE;
  if (s == "pedestrian") return ET_PEDESTRIAN;
  if (s == "cyclist") return ET_CYCLIST;
  return ET_NONE;
}

int32_t road_type_of(const std::string& s) {
  if (s == "road_edge") return ET_ROAD_EDGE;
  if (s == "road_line") return ET_ROAD_LINE;
  if (s == "lane") return ET_ROAD_LANE;
  if (s == "crosswalk") return ET_CROSSWALK;
  if (s == "speed_bump") return ET_SPEED_BUMP;
  if (s == "stop_sign") return ET_STOP_SIGN;
  return ET_NONE;
}

// Iterative triangle-area polyline decimation
// (reference: src/json_serialization.hpp:144-196).
void reduce_polyline(const std::vector<float>& xs, const std::vector<float>& ys,
                     float threshold, std::vector<uint8_t>& skip) {
  const int64_t n = static_cast<int64_t>(xs.size());
  skip.assign(n, 0);
  bool changed = true;
  while (changed) {
    changed = false;
    int64_t k = 0;
    while (k < n - 1) {
      int64_t k1 = k + 1;
      while (k1 < n - 1 && skip[k1]) ++k1;
      if (k1 >= n - 1) break;
      int64_t k2 = k1 + 1;
      while (k2 < n && skip[k2]) ++k2;
      if (k2 >= n) break;
      float area = 0.5f * std::fabs((xs[k] - xs[k2]) * (ys[k1] - ys[k]) -
                                    (xs[k] - xs[k1]) * (ys[k2] - ys[k]));
      if (area < threshold) {
        skip[k1] = 1;
        k = k2;
        changed = true;
      } else {
        k = k1;
      }
    }
  }
  if (n > 0) {
    skip[0] = 0;
    skip[n - 1] = 0;
  }
}

struct SceneOut {
  // agents [A, ...]
  uint8_t* valid;            // [A]
  int32_t* etype;            // [A]
  float* size;               // [A, 3]
  float* goal;               // [A, 2]
  int32_t* aid;              // [A]
  uint8_t* controlled;       // [A]
  uint8_t* is_static;        // [A]
  uint8_t* mark_expert;      // [A]
  int32_t* metadata;         // [A, 4]
  float* traj_pos;           // [A, T, 2]
  float* traj_vel;           // [A, T, 2]
  float* traj_yaw;           // [A, T]
  float* traj_valid;         // [A, T]
  // roads [R_cap, ...]
  float* road_pos;           // [R, 3]
  float* road_yaw;           // [R]
  float* road_scale;         // [R, 3]
  int32_t* road_type;        // [R]
  int32_t* road_id;          // [R]
  int32_t* road_map_type;    // [R]
  // scalars
  int32_t* num_agents;       // [1]
  int32_t* num_roads;        // [1]
  float* mean;               // [2]
  int32_t* name_codes;       // [32]
  int32_t* scenario_codes;   // [32]
};

struct Options {
  float polyline_threshold;
  int32_t ignore_non_vehicles;
  int32_t init_only_valid;
  int32_t read_tracks;
  int32_t is_static_controlled;
  int32_t max_controlled;
  int32_t r_cap;
};

void str_codes(const std::string& s, int32_t* out) {
  // Matches the Python loader: one code unit per character, 32 cap.  The
  // scene names are ASCII in practice.
  for (int i = 0; i < 32; ++i) out[i] = 0;
  int i = 0;
  for (unsigned char c : s) {
    if (i >= 32) break;
    out[i++] = static_cast<int32_t>(c);
  }
}

}  // namespace

extern "C" int compile_scene_json(const char* data, int64_t n,
                                  const Options* opt,
                                  const int32_t* deleted, int32_t n_deleted,
                                  SceneOut* out) {
  Parser parser(data, static_cast<size_t>(n));
  JValue root = parser.parse_value();
  if (!parser.ok || root.kind != JValue::Obj) return -1;

  const JValue* objects = root.get("objects");
  const JValue* roads = root.get("roads");
  if (!objects || objects->kind != JValue::Arr || !roads ||
      roads->kind != JValue::Arr)
    return -2;

  const JValue* name = root.get("name");
  const JValue* scen = root.get("scenario_id");
  str_codes(name && name->kind == JValue::Str ? name->str : "",
            out->name_codes);
  str_codes(scen && scen->kind == JValue::Str ? scen->str : "",
            out->scenario_codes);

  // ---- world mean over valid object positions + ALL raw road points
  // (reference: src/json_serialization.hpp:246-279) -----------------------
  double mx = 0.0, my = 0.0;
  int64_t count = 0;
  for (const JValue& o : *objects->arr) {
    const JValue* pos = o.get("position");
    const JValue* valid = o.get("valid");
    if (!pos || pos->kind != JValue::Arr) continue;
    for (size_t i = 0; i < pos->arr->size(); ++i) {
      bool v = valid && valid->kind == JValue::Arr &&
               i < valid->arr->size() && (*valid->arr)[i].b;
      if (!v) continue;
      const JValue& p = (*pos->arr)[i];
      const JValue* px = p.get("x");
      const JValue* py = p.get("y");
      mx += px ? px->num : 0.0;
      my += py ? py->num : 0.0;
      ++count;
    }
  }
  for (const JValue& r : *roads->arr) {
    const JValue* g = r.get("geometry");
    if (!g || g->kind != JValue::Arr) continue;
    for (const JValue& p : *g->arr) {
      const JValue* px = p.get("x");
      const JValue* py = p.get("y");
      mx += px ? px->num : 0.0;
      my += py ? py->num : 0.0;
      ++count;
    }
  }
  if (count > 0) {
    mx /= count;
    my /= count;
  }
  const float mean_x = static_cast<float>(mx);
  const float mean_y = static_cast<float>(my);
  out->mean[0] = mean_x;
  out->mean[1] = mean_y;

  // ---- object ordering: SDC first, then tracks_to_predict,
  // objects_of_interest, rest (reference: json_serialization.hpp:293-399) --
  // Caps mirror init.hpp:8-12 (MAX_OBJECTS=515).
  const size_t n_obj = std::min<size_t>(objects->arr->size(), 515);
  std::vector<int32_t> order;
  std::vector<int32_t> md_sdc(n_obj, 0), md_ooi(n_obj, 0), md_ttp(n_obj, 0),
      md_diff(n_obj, 0);
  {
    const JValue* meta = root.get("metadata");
    int64_t sdc = -1;
    std::map<int64_t, int64_t> ttp;  // track_index -> difficulty
    std::vector<int64_t> ooi_ids;
    if (meta && meta->kind == JValue::Obj) {
      const JValue* s = meta->get("sdc_track_index");
      if (s) sdc = static_cast<int64_t>(s->as_num(-1));
      const JValue* t = meta->get("tracks_to_predict");
      if (t && t->kind == JValue::Arr) {
        for (const JValue& e : *t->arr) {
          const JValue* ti = e.get("track_index");
          const JValue* d = e.get("difficulty");
          if (ti) {
            int64_t idx = static_cast<int64_t>(ti->num);
            if (idx >= 0 && idx < static_cast<int64_t>(n_obj))
              ttp[idx] = d ? static_cast<int64_t>(d->num) : 0;
          }
        }
      }
      const JValue* o = meta->get("objects_of_interest");
      if (o && o->kind == JValue::Arr)
        for (const JValue& e : *o->arr)
          ooi_ids.push_back(static_cast<int64_t>(e.num));
    }
    auto obj_id = [&](size_t i) -> int64_t {
      const JValue* v = (*objects->arr)[i].get("id");
      return v ? static_cast<int64_t>(v->num) : -1;
    };
    std::vector<uint8_t> used(n_obj, 0);
    std::vector<int64_t> ooi = ooi_ids;
    auto in_ooi = [&](int64_t id) {
      for (size_t k = 0; k < ooi.size(); ++k)
        if (ooi[k] == id) {
          ooi.erase(ooi.begin() + k);
          return true;
        }
      return false;
    };
    if (sdc >= 0 && sdc < static_cast<int64_t>(n_obj)) {
      md_sdc[sdc] = 1;
      auto it = ttp.find(sdc);
      if (it != ttp.end()) {
        md_ttp[sdc] = 1;
        md_diff[sdc] = static_cast<int32_t>(it->second);
        ttp.erase(it);
      }
      if (in_ooi(obj_id(sdc))) md_ooi[sdc] = 1;
      order.push_back(static_cast<int32_t>(sdc));
      used[sdc] = 1;
    }
    for (size_t i = 0; i < n_obj; ++i) {
      if (used[i]) continue;
      auto it = ttp.find(static_cast<int64_t>(i));
      if (it == ttp.end()) continue;
      md_ttp[i] = 1;
      md_diff[i] = static_cast<int32_t>(it->second);
      if (in_ooi(obj_id(i))) md_ooi[i] = 1;
      order.push_back(static_cast<int32_t>(i));
      used[i] = 1;
    }
    for (size_t i = 0; i < n_obj; ++i) {
      if (used[i]) continue;
      if (!in_ooi(obj_id(i))) continue;
      md_ooi[i] = 1;
      order.push_back(static_cast<int32_t>(i));
      used[i] = 1;
    }
    for (size_t i = 0; i < n_obj; ++i)
      if (!used[i]) order.push_back(static_cast<int32_t>(i));
  }

  // ---- agent creation (reference: src/level_gen.cpp:396-465) -------------
  auto is_deleted = [&](int64_t id) {
    for (int32_t k = 0; k < n_deleted; ++k)
      if (deleted[k] == id) return true;
    return false;
  };

  int32_t agent_idx = 0;
  int32_t num_controlled = 0;
  for (int32_t oi : order) {
    if (agent_idx >= kMaxAgents) break;
    const JValue& o = (*objects->arr)[oi];
    const JValue* type_v = o.get("type");
    int32_t etype = type_v ? object_type_of(type_v->str) : ET_NONE;
    const JValue* valid_v = o.get("valid");
    bool valid0 = valid_v && valid_v->kind == JValue::Arr &&
                  !valid_v->arr->empty() && (*valid_v->arr)[0].b;
    const JValue* id_v = o.get("id");
    int64_t oid = id_v ? static_cast<int64_t>(id_v->num) : -1;

    // shouldAgentBeCreated (src/level_gen.cpp:353-394)
    if (opt->read_tracks) {
      if (is_deleted(oid)) continue;
    } else {
      if (opt->ignore_non_vehicles &&
          (etype == ET_PEDESTRIAN || etype == ET_CYCLIST))
        continue;
      if (etype == ET_NONE) continue;
      if (opt->init_only_valid && !valid0) continue;
      if (is_deleted(oid)) continue;
    }

    const int32_t a = agent_idx;
    out->valid[a] = 1;
    out->etype[a] = etype;
    out->aid[a] = static_cast<int32_t>(oid);
    const JValue* len_v = o.get("length");
    const JValue* wid_v = o.get("width");
    const JValue* hei_v = o.get("height");
    out->size[a * 3 + 0] = len_v ? static_cast<float>(len_v->num) : 0.f;
    out->size[a * 3 + 1] = wid_v ? static_cast<float>(wid_v->num) : 0.f;
    out->size[a * 3 + 2] = hei_v ? static_cast<float>(hei_v->num) : 0.f;
    const JValue* goal_v = o.get("goalPosition");
    float gx = 0.f, gy = 0.f;
    if (goal_v) {
      const JValue* x = goal_v->get("x");
      const JValue* y = goal_v->get("y");
      gx = x ? static_cast<float>(x->num) - mean_x : 0.f;
      gy = y ? static_cast<float>(y->num) - mean_y : 0.f;
    }
    out->goal[a * 2 + 0] = gx;
    out->goal[a * 2 + 1] = gy;
    const JValue* me = o.get("mark_as_expert");
    bool mark_expert = me && me->kind == JValue::Bool && me->b;
    out->mark_expert[a] = mark_expert ? 1 : 0;
    out->metadata[a * 4 + 0] = md_sdc[oi];
    out->metadata[a * 4 + 1] = md_ooi[oi];
    out->metadata[a * 4 + 2] = md_ttp[oi];
    out->metadata[a * 4 + 3] = md_diff[oi];

    // trajectory (demeaned), reference: src/level_gen.cpp:56-100
    const JValue* pos_v = o.get("position");
    const JValue* vel_v = o.get("velocity");
    const JValue* head_v = o.get("heading");
    size_t n_pos =
        pos_v && pos_v->kind == JValue::Arr ? pos_v->arr->size() : 0;
    if (n_pos > kMaxPositions) n_pos = kMaxPositions;
    for (size_t t = 0; t < n_pos; ++t) {
      const JValue& p = (*pos_v->arr)[t];
      const JValue* x = p.get("x");
      const JValue* y = p.get("y");
      out->traj_pos[(a * kTrajLen + t) * 2 + 0] =
          x ? static_cast<float>(x->num) - mean_x : 0.f;
      out->traj_pos[(a * kTrajLen + t) * 2 + 1] =
          y ? static_cast<float>(y->num) - mean_y : 0.f;
      if (vel_v && t < vel_v->arr->size()) {
        const JValue& vv = (*vel_v->arr)[t];
        const JValue* vx = vv.get("x");
        const JValue* vy = vv.get("y");
        out->traj_vel[(a * kTrajLen + t) * 2 + 0] =
            vx ? static_cast<float>(vx->num) : 0.f;
        out->traj_vel[(a * kTrajLen + t) * 2 + 1] =
            vy ? static_cast<float>(vy->num) : 0.f;
      }
      if (head_v && t < head_v->arr->size())
        out->traj_yaw[a * kTrajLen + t] =
            static_cast<float>((*head_v->arr)[t].num);
      if (valid_v && t < valid_v->arr->size())
        out->traj_valid[a * kTrajLen + t] =
            (*valid_v->arr)[t].b ? 1.f : 0.f;
    }

    // isAgentStatic (src/level_gen.cpp:102-113)
    bool is_static;
    if (opt->read_tracks && out->metadata[a * 4 + 2] != -1) {
      is_static = false;
    } else {
      float dx = gx - out->traj_pos[(a * kTrajLen) * 2 + 0];
      float dy = gy - out->traj_pos[(a * kTrajLen) * 2 + 1];
      is_static = !opt->is_static_controlled &&
                  std::sqrt(dx * dx + dy * dy) < kStaticThreshold;
    }
    out->is_static[a] = is_static ? 1 : 0;

    // isAgentControllable (src/level_gen.cpp:115-129)
    bool controllable;
    if (opt->read_tracks) {
      controllable = num_controlled < opt->max_controlled &&
                     out->metadata[a * 4 + 2] != -1;
    } else {
      controllable = num_controlled < opt->max_controlled && valid0 &&
                     !is_static && !mark_expert;
    }
    out->controlled[a] = controllable ? 1 : 0;
    num_controlled += controllable ? 1 : 0;
    ++agent_idx;
  }
  *out->num_agents = agent_idx;

  // ---- road entities (reference: src/level_gen.cpp:166-296) --------------
  int32_t r_idx = 0;
  std::vector<float> xs, ys;
  std::vector<uint8_t> skip;
  size_t road_count = 0;
  for (const JValue& r : *roads->arr) {
    if (r_idx >= opt->r_cap) break;
    if (++road_count > 956) break;  // MAX_ROADS (init.hpp:10)
    const JValue* type_v = r.get("type");
    int32_t etype = type_v ? road_type_of(type_v->str) : ET_NONE;
    const JValue* g = r.get("geometry");
    if (!g || g->kind != JValue::Arr || g->arr->empty()) continue;
    const JValue* rid_v = r.get("id");
    int32_t rid = rid_v ? static_cast<int32_t>(rid_v->num) : 0;
    const JValue* mt_v = r.get("map_element_id");
    int32_t mt = mt_v ? static_cast<int32_t>(mt_v->num) : -1;
    if (mt == 4 || mt >= 21 || mt < -1) mt = -1;

    xs.clear();
    ys.clear();
    for (const JValue& p : *g->arr) {
      const JValue* x = p.get("x");
      const JValue* y = p.get("y");
      xs.push_back(x ? static_cast<float>(x->num) : 0.f);
      ys.push_back(y ? static_cast<float>(y->num) : 0.f);
    }

    if (etype == ET_ROAD_EDGE || etype == ET_ROAD_LINE ||
        etype == ET_ROAD_LANE) {
      const int64_t num_segments = static_cast<int64_t>(xs.size()) - 1;
      if (num_segments >= 10) {
        reduce_polyline(xs, ys, opt->polyline_threshold, skip);
        size_t w = 0;
        for (size_t i = 0; i < xs.size(); ++i) {
          if (skip[i]) continue;
          xs[w] = xs[i];
          ys[w] = ys[i];
          ++w;
        }
        xs.resize(w);
        ys.resize(w);
      }
      if (xs.size() > kMaxGeometry) {
        xs.resize(kMaxGeometry);
        ys.resize(kMaxGeometry);
      }
      const float z =
          1.0f + (etype == ET_ROAD_EDGE ? 0.1f : -0.1f);
      for (size_t j = 0; j + 1 < xs.size(); ++j) {
        if (r_idx >= opt->r_cap) break;
        float x1 = xs[j] - mean_x, y1 = ys[j] - mean_y;
        float x2 = xs[j + 1] - mean_x, y2 = ys[j + 1] - mean_y;
        out->road_pos[r_idx * 3 + 0] = (x1 + x2) * 0.5f;
        out->road_pos[r_idx * 3 + 1] = (y1 + y2) * 0.5f;
        out->road_pos[r_idx * 3 + 2] = z;
        out->road_yaw[r_idx] = std::atan2(y2 - y1, x2 - x1);
        float half =
            std::sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) * 0.5f;
        out->road_scale[r_idx * 3 + 0] = half;
        out->road_scale[r_idx * 3 + 1] = 0.1f;
        out->road_scale[r_idx * 3 + 2] = 0.1f;
        out->road_type[r_idx] = etype;
        out->road_id[r_idx] = rid;
        out->road_map_type[r_idx] = mt;
        ++r_idx;
      }
    } else if (etype == ET_CROSSWALK || etype == ET_SPEED_BUMP) {
      if (xs.size() < 4) continue;
      float lengths[4];
      for (int i = 0; i < 4; ++i) {
        int j = (i + 1) % 4;
        lengths[i] = std::sqrt((xs[j] - xs[i]) * (xs[j] - xs[i]) +
                               (ys[j] - ys[i]) * (ys[j] - ys[i]));
      }
      int imax = 0, imin = 0;
      for (int i = 1; i < 4; ++i) {
        if (lengths[i] > lengths[imax]) imax = i;
        if (lengths[i] < lengths[imin]) imin = i;
      }
      int jnext = (imax + 1) % 4;
      float angle = std::atan2(ys[jnext] - ys[imax], xs[jnext] - xs[imax]);
      float sx = 0.f, sy = 0.f;
      for (int i = 0; i < 4; ++i) {
        sx += xs[i];
        sy += ys[i];
      }
      out->road_pos[r_idx * 3 + 0] = sx / 4.f - mean_x;
      out->road_pos[r_idx * 3 + 1] = sy / 4.f - mean_y;
      out->road_pos[r_idx * 3 + 2] = 1.0f - 0.1f;
      out->road_yaw[r_idx] = angle;
      out->road_scale[r_idx * 3 + 0] = lengths[imax] / 2.f;
      out->road_scale[r_idx * 3 + 1] = lengths[imin] / 2.f;
      out->road_scale[r_idx * 3 + 2] = 0.1f;
      out->road_type[r_idx] = etype;
      out->road_id[r_idx] = rid;
      out->road_map_type[r_idx] = mt;
      ++r_idx;
    } else if (etype == ET_STOP_SIGN) {
      out->road_pos[r_idx * 3 + 0] = xs[0] - mean_x;
      out->road_pos[r_idx * 3 + 1] = ys[0] - mean_y;
      out->road_pos[r_idx * 3 + 2] = 1.0f;
      out->road_yaw[r_idx] = 0.f;
      out->road_scale[r_idx * 3 + 0] = 0.2f;
      out->road_scale[r_idx * 3 + 1] = 0.2f;
      out->road_scale[r_idx * 3 + 2] = 1.f;
      out->road_type[r_idx] = etype;
      out->road_id[r_idx] = rid;
      out->road_map_type[r_idx] = mt;
      ++r_idx;
    }
    // ET_NONE (driveways): no entity (src/level_gen.cpp:293-294)
  }
  *out->num_roads = r_idx;
  return 0;
}
