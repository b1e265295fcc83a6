// bagreader — ROS-free rosbag (format 2.0) decoder for lins_tpu.
//
// Replaces the reference's online ROS transport + rosbag replay
// (Estimator.cpp:124-139, run_port_exp.launch) with offline decoding of
// sensor_msgs/Imu and sensor_msgs/PointCloud2 messages straight into packed
// arrays the JAX pipeline consumes.  No ROS, no boost: plain C++17 reading
// the bag record format directly.  Exposed through a C API for ctypes.
//
// Supports uncompressed ('none') chunks; compressed bags must be
// decompressed first (`rosbag decompress`).

#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

struct Field {
  const uint8_t* data;
  uint32_t len;
};

using HeaderMap = std::map<std::string, Field>;

uint32_t rd_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

double rd_time(const uint8_t* p) {
  return rd_u32(p) + 1e-9 * rd_u32(p + 4);
}

// Parse a bag header block: sequence of (len u32, "name=", value).
bool parse_header(const uint8_t* p, uint32_t len, HeaderMap* out) {
  uint32_t off = 0;
  while (off + 4 <= len) {
    uint32_t flen = rd_u32(p + off);
    off += 4;
    if (off + flen > len) return false;
    const uint8_t* eq =
        static_cast<const uint8_t*>(std::memchr(p + off, '=', flen));
    if (!eq) return false;
    std::string name(reinterpret_cast<const char*>(p + off), eq - (p + off));
    uint32_t vlen = flen - static_cast<uint32_t>(eq - (p + off)) - 1;
    (*out)[name] = Field{eq + 1, vlen};
    off += flen;
  }
  return true;
}

struct ImuSample {
  double t;
  double acc[3];
  double gyr[3];
};

struct Cloud {
  double t;
  std::vector<float> xyz;    // N*3
  std::vector<int32_t> ring; // N (-1 when absent)
};

struct Bag {
  std::vector<ImuSample> imu;
  std::vector<Cloud> clouds;
  std::string error;
};

// --- message deserialization -------------------------------------------------

// Skip a ROS Header (seq u32, stamp 2*u32, frame_id string), return new
// offset or UINT32_MAX on overflow.
uint32_t skip_ros_header(const uint8_t* d, uint32_t len, uint32_t off) {
  if (off + 12 > len) return UINT32_MAX;
  off += 12;
  if (off + 4 > len) return UINT32_MAX;
  uint32_t slen = rd_u32(d + off);
  off += 4 + slen;
  return off <= len ? off : UINT32_MAX;
}

bool parse_imu(const uint8_t* d, uint32_t len, double t, ImuSample* out) {
  uint32_t off = skip_ros_header(d, len, 0);
  if (off == UINT32_MAX) return false;
  // orientation (4 f64) + cov (9 f64) = 13 f64
  // angular_velocity (3 f64) + cov (9 f64)
  // linear_acceleration (3 f64) + cov (9 f64)
  if (off + (13 + 12 + 12) * 8 > len) return false;
  const uint8_t* p = d + off + 13 * 8;
  std::memcpy(out->gyr, p, 3 * 8);
  p += 12 * 8;
  std::memcpy(out->acc, p, 3 * 8);
  out->t = t;
  return true;
}

struct PointField {
  std::string name;
  uint32_t offset;
  uint8_t datatype;
};

bool parse_cloud(const uint8_t* d, uint32_t len, double t, Cloud* out) {
  uint32_t off = skip_ros_header(d, len, 0);
  if (off == UINT32_MAX || off + 12 > len) return false;
  uint32_t height = rd_u32(d + off);
  uint32_t width = rd_u32(d + off + 4);
  uint32_t nfields = rd_u32(d + off + 8);
  off += 12;

  std::vector<PointField> fields;
  for (uint32_t i = 0; i < nfields; ++i) {
    if (off + 4 > len) return false;
    uint32_t slen = rd_u32(d + off);
    off += 4;
    if (off + slen + 9 > len) return false;
    PointField f;
    f.name.assign(reinterpret_cast<const char*>(d + off), slen);
    off += slen;
    f.offset = rd_u32(d + off);
    f.datatype = d[off + 4];
    // count u32 at off+5..offset+9
    off += 9;
    fields.push_back(f);
  }
  if (off + 1 + 8 > len) return false;
  off += 1;  // is_bigendian
  uint32_t point_step = rd_u32(d + off);
  off += 8;  // point_step + row_step
  if (off + 4 > len) return false;
  uint32_t dlen = rd_u32(d + off);
  off += 4;
  if (off + dlen > len || point_step == 0) return false;
  const uint8_t* pts = d + off;
  uint32_t n = height * width;
  if (static_cast<uint64_t>(n) * point_step > dlen) n = dlen / point_step;

  int32_t ox = -1, oy = -1, oz = -1, oring = -1;
  uint8_t ring_type = 0;
  for (const auto& f : fields) {
    if (f.name == "x") ox = f.offset;
    else if (f.name == "y") oy = f.offset;
    else if (f.name == "z") oz = f.offset;
    else if (f.name == "ring") { oring = f.offset; ring_type = f.datatype; }
  }
  if (ox < 0 || oy < 0 || oz < 0) return false;

  out->t = t;
  out->xyz.resize(static_cast<size_t>(n) * 3);
  out->ring.assign(n, -1);
  for (uint32_t i = 0; i < n; ++i) {
    const uint8_t* p = pts + static_cast<size_t>(i) * point_step;
    std::memcpy(&out->xyz[i * 3 + 0], p + ox, 4);
    std::memcpy(&out->xyz[i * 3 + 1], p + oy, 4);
    std::memcpy(&out->xyz[i * 3 + 2], p + oz, 4);
    if (oring >= 0) {
      if (ring_type == 4) {  // uint16
        uint16_t r;
        std::memcpy(&r, p + oring, 2);
        out->ring[i] = r;
      } else if (ring_type == 5 || ring_type == 6) {  // int32/uint32
        int32_t r;
        std::memcpy(&r, p + oring, 4);
        out->ring[i] = r;
      }
    }
  }
  return true;
}

// --- record stream -----------------------------------------------------------

struct TopicTable {
  std::map<uint32_t, std::string> conn_topic;
};

void handle_records(const uint8_t* p, size_t len, const std::string& imu_topic,
                    const std::string& cloud_topic, TopicTable* topics,
                    Bag* bag, int depth);

void handle_one(const HeaderMap& h, const uint8_t* data, uint32_t dlen,
                const std::string& imu_topic, const std::string& cloud_topic,
                TopicTable* topics, Bag* bag, int depth) {
  auto it = h.find("op");
  if (it == h.end() || it->second.len < 1) return;
  uint8_t op = it->second.data[0];

  if (op == 0x07) {  // connection
    auto c = h.find("conn");
    auto t = h.find("topic");
    if (c != h.end() && t != h.end()) {
      uint32_t conn = rd_u32(c->second.data);
      std::string topic(reinterpret_cast<const char*>(t->second.data),
                        t->second.len);
      topics->conn_topic[conn] = topic;
    }
  } else if (op == 0x02) {  // message data
    auto c = h.find("conn");
    auto tm = h.find("time");
    if (c == h.end() || tm == h.end()) return;
    uint32_t conn = rd_u32(c->second.data);
    double t = rd_time(tm->second.data);
    auto topic_it = topics->conn_topic.find(conn);
    if (topic_it == topics->conn_topic.end()) return;
    if (topic_it->second == imu_topic) {
      ImuSample s;
      if (parse_imu(data, dlen, t, &s)) bag->imu.push_back(s);
    } else if (topic_it->second == cloud_topic) {
      Cloud cl;
      if (parse_cloud(data, dlen, t, &cl)) bag->clouds.push_back(std::move(cl));
    }
  } else if (op == 0x05 && depth < 2) {  // chunk
    auto comp = h.find("compression");
    std::string c = comp != h.end()
        ? std::string(reinterpret_cast<const char*>(comp->second.data),
                      comp->second.len)
        : "none";
    if (c == "none") {
      handle_records(data, dlen, imu_topic, cloud_topic, topics, bag,
                     depth + 1);
    } else {
      bag->error = "compressed chunk (" + c + "); run `rosbag decompress`";
    }
  }
  // ops 0x03 (bag header), 0x04 (index), 0x06 (chunk info): skipped
}

void handle_records(const uint8_t* p, size_t len, const std::string& imu_topic,
                    const std::string& cloud_topic, TopicTable* topics,
                    Bag* bag, int depth) {
  size_t off = 0;
  while (off + 4 <= len) {
    uint32_t hlen = rd_u32(p + off);
    off += 4;
    if (off + hlen + 4 > len) break;
    HeaderMap h;
    if (!parse_header(p + off, hlen, &h)) break;
    off += hlen;
    uint32_t dlen = rd_u32(p + off);
    off += 4;
    if (off + dlen > len) break;
    handle_one(h, p + off, dlen, imu_topic, cloud_topic, topics, bag, depth);
    off += dlen;
  }
}

}  // namespace

extern "C" {

void* bag_open(const char* path, const char* imu_topic,
               const char* cloud_topic) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return nullptr;
  size_t size = static_cast<size_t>(f.tellg());
  f.seekg(0);
  std::vector<uint8_t> buf(size);
  f.read(reinterpret_cast<char*>(buf.data()), size);

  const char magic[] = "#ROSBAG V2.0\n";
  size_t mlen = sizeof(magic) - 1;
  if (size < mlen || std::memcmp(buf.data(), magic, mlen) != 0) return nullptr;

  auto* bag = new Bag();
  TopicTable topics;
  handle_records(buf.data() + mlen, size - mlen, imu_topic, cloud_topic,
                 &topics, bag, 0);
  return bag;
}

const char* bag_error(void* h) {
  return static_cast<Bag*>(h)->error.c_str();
}

int bag_num_imu(void* h) {
  return static_cast<int>(static_cast<Bag*>(h)->imu.size());
}

int bag_num_clouds(void* h) {
  return static_cast<int>(static_cast<Bag*>(h)->clouds.size());
}

void bag_get_imu(void* h, double* times, double* acc, double* gyr) {
  Bag* b = static_cast<Bag*>(h);
  for (size_t i = 0; i < b->imu.size(); ++i) {
    times[i] = b->imu[i].t;
    std::memcpy(acc + i * 3, b->imu[i].acc, 3 * sizeof(double));
    std::memcpy(gyr + i * 3, b->imu[i].gyr, 3 * sizeof(double));
  }
}

int bag_cloud_size(void* h, int idx) {
  Bag* b = static_cast<Bag*>(h);
  if (idx < 0 || idx >= static_cast<int>(b->clouds.size())) return -1;
  return static_cast<int>(b->clouds[idx].ring.size());
}

double bag_cloud_time(void* h, int idx) {
  return static_cast<Bag*>(h)->clouds[idx].t;
}

void bag_get_cloud(void* h, int idx, float* xyz, int32_t* ring) {
  Bag* b = static_cast<Bag*>(h);
  const Cloud& c = b->clouds[idx];
  std::memcpy(xyz, c.xyz.data(), c.xyz.size() * sizeof(float));
  std::memcpy(ring, c.ring.data(), c.ring.size() * sizeof(int32_t));
}

void bag_close(void* h) { delete static_cast<Bag*>(h); }

}  // extern "C"
